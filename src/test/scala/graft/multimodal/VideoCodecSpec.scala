package graft.multimodal

import graft.SparkSpec

/** Independent re-derivation of the GVID container codec: a
  * plain-Scala encoder + decoder (no Spark expressions, no hex
  * transcode) must agree with the mm14 decode and the mm15 shot
  * detection on every row.
  */
class VideoCodecSpec extends SparkSpec {

  private def geom(id: Long): (Long, Long, Long) =
    (3 + id % 4, 4 + id % 3, 3 + id % 3)

  private def pixel(id: Long, k: Long, npix: Long): Long = {
    val f = k / npix
    val i = k % npix
    (((id * 23 + (f / 2) * 41 + f * 3 + i * 7) % 256) + 256) % 256
  }

  private def encode(id: Long): Array[Byte] = {
    val (nf, vw, vh) = geom(id)
    val npix = vw * vh
    val hdr = Array[Byte](0x47, 0x56, 0x49, 0x44, nf.toByte, vw.toByte,
      vh.toByte)
    val full = hdr ++ (0L until nf * npix).map(k => pixel(id, k, npix).toByte)
    if (id % 3 == 0) full.dropRight(1) else full
  }

  test("mm14 decode agrees with a plain-Scala decoder on every planted row") {
    val rows = graft.ops.MediaQueries
      .queries("mm14_video_decode")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var corrupt = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (nf, vw, vh) = geom(id)
      val npix = vw * vh
      assert(r.getAs[Long]("n_bytes") === encode(id).length.toLong, s"id=$id")
      if (id % 3 == 0) {
        corrupt += 1
        assert(!r.getAs[Boolean]("valid"), s"id=$id corrupt arm not reported")
        assert(r.isNullAt(r.fieldIndex("px_sum")), s"id=$id")
        assert(r.getAs[Long]("nf_hdr") === nf, s"id=$id header still decodes")
      } else {
        assert(r.getAs[Boolean]("valid"), s"id=$id")
        val px = (0L until nf * npix).map(k => pixel(id, k, npix))
        assert(r.getAs[Long]("px_sum") === px.sum, s"id=$id")
        assert(
          r.getAs[Long]("px_possum") ===
            px.zipWithIndex.map { case (p, k) => (k + 1) * p }.sum,
          s"id=$id positional checksum")
        assert(
          r.getAs[Long]("mean_first_milli") ===
            px.take(npix.toInt).sum * 1000 / npix,
          s"id=$id")
        assert(
          r.getAs[Long]("mean_last_milli") ===
            px.takeRight(npix.toInt).sum * 1000 / npix,
          s"id=$id")
      }
    }
    assert(corrupt > 0, "fixture lost its corrupt arm")
  }

  test("mm16 frame sample re-encodes exactly the strided frames, in order") {
    val rows = graft.ops.MediaQueries
      .queries("mm16_frame_sample")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (nf, vw, vh) = geom(id)
      val npix = vw * vh
      val stride = (nf + 2) / 3
      val kept = (1L to nf by stride).toSeq
      assert(r.getAs[Long]("stride") === stride, s"id=$id")
      assert(r.getAs[Long]("nf_out") === kept.size.toLong, s"id=$id")
      assert(r.getAs[Long]("npx_out") === kept.size * npix, s"id=$id")
      // independent re-encode: header + kept frames byte-for-byte
      val out = Array[Byte](0x47, 0x56, 0x49, 0x44, kept.size.toByte,
        vw.toByte, vh.toByte) ++ kept.flatMap(f =>
        (0L until npix).map(i => pixel(id, (f - 1) * npix + i, npix).toByte))
      val possum = out.drop(7).zipWithIndex
        .map { case (b, k) => (k + 1L) * ((b.toLong + 256) % 256) }
        .sum
      assert(r.getAs[Long]("out_possum") === possum,
        s"id=$id sampled payload bytes diverge from the plain-Scala sampler")
    }
  }

  test("mm15 shot bounds agree with a plain-Scala segmenter; threshold non-vacuous") {
    val rows = graft.ops.MediaQueries
      .queries("mm15_video_shots")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val th = 20000L
    var cut = false
    var uncut = false
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (nf, vw, vh) = geom(id)
      val npix = vw * vh
      val px = (0L until nf * npix).map(k => pixel(id, k, npix))
      val fmeans = (0L until nf).map(f =>
        px.slice((f * npix).toInt, ((f + 1) * npix).toInt).sum * 1000 / npix)
      val dl = (1 until nf.toInt).map(f => math.abs(fmeans(f) - fmeans(f - 1)))
      val cuts = dl.zipWithIndex.collect { case (d, k) if d > th => k + 2L }
      assert(r.getAs[Long]("n_frames") === nf, s"id=$id")
      assert(r.getAs[Long]("n_cuts") === cuts.size.toLong, s"id=$id")
      assert(r.getAs[Long]("n_shots") === cuts.size.toLong + 1, s"id=$id")
      assert(r.getAs[Long]("cut_fsum") === cuts.sum, s"id=$id")
      assert(r.getAs[Long]("cut_fsqsum") === cuts.map(c => c * c).sum, s"id=$id")
      assert(r.getAs[Long]("max_delta") === dl.max, s"id=$id")
      if (cuts.size < nf - 1) uncut = true
      if (cuts.nonEmpty) cut = true
    }
    assert(cut && uncut, "mm15 threshold is vacuous on the fixture")
  }
}
