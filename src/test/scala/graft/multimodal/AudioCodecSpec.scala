package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Independent re-derivation of the GWAV codec: a plain-Scala encoder
  * + decoder (no Spark expressions, no hex transcode) must agree with
  * the mm12 query's decode on every row — and the corrupt arm must be
  * REPORTED (valid = false), never dropped.
  */
class AudioCodecSpec extends SparkSpec {

  private def sample(id: Long, i: Long): Long =
    (((id * 17 + ((id + i / 8) % 3) * 29 + i * 5) % 256) + 256) % 256

  private def encode(id: Long): Array[Byte] = {
    val sr = 1 + id % 3
    val ns = 24 + (id % 5) * 8
    val hdr = Array[Byte](0x47, 0x57, 0x41, 0x56, sr.toByte,
      ((ns >> 8) & 0xff).toByte, (ns & 0xff).toByte)
    val full = hdr ++ (0L until ns).map(i => sample(id, i).toByte)
    if (id % 3 == 0) full.dropRight(1) else full
  }

  test("mm12 decode agrees with a plain-Scala decoder on every planted row") {
    val rows = graft.ops.MediaQueries
      .queries("mm12_audio_decode")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var corrupt = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = encode(id)
      assert(r.getAs[Long]("n_bytes") === bytes.length.toLong, s"id=$id")
      val ns = 24 + (id % 5) * 8
      if (id % 3 == 0) {
        corrupt += 1
        assert(!r.getAs[Boolean]("valid"), s"id=$id corrupt arm not reported")
        assert(r.isNullAt(r.fieldIndex("amp_sum")), s"id=$id corrupt stats not NULL")
        // header still decoded: damage is reported WITH context
        assert(r.getAs[Long]("ns_hdr") === ns, s"id=$id")
      } else {
        assert(r.getAs[Boolean]("valid"), s"id=$id")
        val amps = (0L until ns).map(i => sample(id, i))
        assert(r.getAs[Long]("n_samples") === ns, s"id=$id")
        assert(r.getAs[Long]("amp_sum") === amps.sum, s"id=$id")
        assert(r.getAs[Long]("amp_min") === amps.min, s"id=$id")
        assert(r.getAs[Long]("amp_max") === amps.max, s"id=$id")
        assert(
          r.getAs[Long]("amp_possum") ===
            amps.zipWithIndex.map { case (a, i) => (i + 1) * a }.sum,
          s"id=$id positional checksum")
        assert(r.getAs[Long]("amp_sqsum") === amps.map(a => a * a).sum, s"id=$id")
      }
    }
    assert(corrupt > 0, "fixture lost its corrupt arm")
  }

  test("mm13 segmentation agrees with a plain-Scala segmenter") {
    val rows = graft.ops.MediaQueries
      .queries("mm13_audio_segments")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val th = 30000L
    var some = false
    var none = false
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val ns = 24 + (id % 5) * 8
      val nw = ns / 8
      val amps = (0L until ns).map(i => sample(id, i))
      val wm = (0L until nw).map(w =>
        amps.slice((w * 8).toInt, (w * 8 + 8).toInt).sum * 125L)
      val dl = (1 until nw.toInt).map(k => math.abs(wm(k) - wm(k - 1)))
      val bounds = dl.zipWithIndex.collect {
        case (d, k) if d > th => k + 2L
      }
      assert(r.getAs[Long]("n_windows") === nw, s"id=$id")
      assert(r.getAs[Long]("n_bounds") === bounds.size.toLong, s"id=$id")
      assert(r.getAs[Long]("bound_wsum") === bounds.sum, s"id=$id")
      assert(r.getAs[Long]("bound_wsqsum") === bounds.map(w => w * w).sum,
        s"id=$id")
      assert(r.getAs[Long]("max_delta") === dl.max, s"id=$id")
      if (bounds.size.toLong < nw - 1) none = true
      if (bounds.nonEmpty) some = true
    }
    // the threshold separates real regimes on this fixture: some
    // window boundaries cross it, some do not
    assert(some && none, "mm13 threshold is vacuous on the fixture")
  }
}
