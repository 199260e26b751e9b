package graft.multimodal

import graft.SparkSpec

/** Pins mm10's codec contract from first principles: an independent
  * Scala re-decode of the planted GIMG payloads must agree with the
  * query's expression-decoded stats; damage is REPORTED (valid =
  * false, NULL stats, header kept), never dropped; and the positional
  * checksum is actually order-sensitive.
  */
class RasterCodecSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry
      .queries("mm10_raster_decode")(spark, sfDir)
      .collect()

  test("corrupt arm: truncated payloads report damage with header intact") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val valid = r.getAs[Boolean]("valid")
      assert(valid === (id % 3 != 0), s"media $id validity wrong")
      // header decodes either way (the damage is in the pixel rows)
      assert(r.getAs[Long]("width") === 4 + id % 5)
      assert(r.getAs[Long]("height") === 3 + id % 4)
      if (!valid) assert(r.isNullAt(r.fieldIndex("px_sum")), s"media $id")
    }
  }

  test("expression decode == independent byte-level re-decode") {
    rows.filter(_.getAs[Boolean]("valid")).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val pix = (0 until w * h).map(i => (id * 31 + i * 7) % 256)
      assert(r.getAs[Long]("n_pixels") === w * h.toLong)
      assert(r.getAs[Long]("n_bytes") === 6L + w * h)
      assert(r.getAs[Long]("px_min") === pix.min)
      assert(r.getAs[Long]("px_max") === pix.max)
      assert(r.getAs[Long]("px_sum") === pix.sum)
      assert(
        r.getAs[Long]("px_possum") ===
          pix.zipWithIndex.map { case (p, i) => (i + 1) * p }.sum,
        s"media $id positional checksum"
      )
      assert(r.getAs[Long]("bright_px") === pix.count(_ >= 128))
      assert(r.getAs[Long]("mean_milli") === pix.sum * 1000 / (w * h))
    }
  }

  test("mm11 resize equals an independent box downsample, re-encode intact") {
    val rows = graft.SparkEntry
      .queries("mm11_raster_resize")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val pix = (0 until w * h).map(i => ((id * 31 + i * 7) % 256).toInt)
      val (w2, h2) = (w / 2, h / 2)
      def p(x: Int, y: Int) = pix(y * w + x)
      val out = for {
        j <- 0 until h2
        i <- 0 until w2
      } yield (p(2 * i, 2 * j) + p(2 * i + 1, 2 * j) +
        p(2 * i, 2 * j + 1) + p(2 * i + 1, 2 * j + 1)) / 4
      assert(r.getAs[Long]("w2") === w2.toLong, s"media $id w2")
      assert(r.getAs[Long]("h2") === h2.toLong, s"media $id h2")
      assert(r.getAs[Long]("n_bytes_out") === 6L + w2 * h2, s"media $id bytes")
      assert(r.getAs[Long]("out_px_sum") === out.map(_.toLong).sum, s"media $id sum")
      assert(
        r.getAs[Long]("out_possum") ===
          out.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum,
        s"media $id positional checksum after resize"
      )
    }
  }

  test("positional checksum is order-sensitive where a plain sum is not") {
    val sensitive = rows.filter(_.getAs[Boolean]("valid")).exists { r =>
      val id = r.getAs[Long]("media_id")
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val pix = (0 until w * h).map(i => (id * 31 + i * 7) % 256)
      val rev = pix.reverse
      val possum = pix.zipWithIndex.map { case (p, i) => (i + 1) * p }.sum
      val possumRev = rev.zipWithIndex.map { case (p, i) => (i + 1) * p }.sum
      pix.sum == rev.sum && possum != possumRev
    }
    assert(sensitive, "no planted payload distinguishes order — fixture too weak")
  }
}
