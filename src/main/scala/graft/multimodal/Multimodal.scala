package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media is carried as opaque `binary`
  * payloads with typed metadata, flowing through normal columnar
  * Spark (parquet binary columns, predicate pushdown on metadata,
  * payload pruned unless selected).
  *
  * The decode/feature-extract boundary is [[decodeFeatures]], a typed
  * mapPartitions — exactly where a real implementation would invoke an
  * image/audio codec per partition (batched, library handle reused
  * across rows). The codec itself is STUBBED here (deterministic fake
  * derived from the bytes): this container has no media libraries.
  * The Spark-side contract — schema, partition batching, payload
  * lifecycle — is real and tested.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int
  )

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      checksum: Long,
      n_frames: Int,
      feature: Array[Float]
  )

  /** Wrap a text corpus as a fake media table (payload = utf-8 bytes):
    * the stand-in for `spark.read.format("binaryFile")` / a lakehouse
    * table with a binary column.
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        array(lit("jpeg"), lit("png"), lit("webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      ).as("format"),
      (lit(64) + pmod(col("doc_id") * 7, lit(448))).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id") * 13, lit(448))).cast("int").as("height")
    )

  /** Byte offsets of fixed-size frames within a binary payload:
    * [0, chunk, 2·chunk, …) up to the payload length — the slicing
    * plan of a frame-sampling pass (codec-free; pairs with
    * `posexplode` for one-row-per-frame shape).
    */
  def frameOffsets(payload: org.apache.spark.sql.Column, chunk: Int): org.apache.spark.sql.Column = {
    val nFrames =
      ((octet_length(payload) + chunk - 1).cast("int") / chunk).cast("int")
    // empty payload ⇒ empty array — sequence(0, -1) would otherwise
    // count DOWN (default step -1) and yield [0, -1]
    when(nFrames > 0, transform(sequence(lit(0), nFrames - 1), i => i * chunk))
      .otherwise(array().cast("array<int>"))
  }

  /** 64-bit perceptual difference hash (dHash) of a payload — the
    * image near-dup primitive (Krawetz's dHash: resize to a 9×8
    * luminance grid, bit i = grid[i] < grid[i+1]; two re-encodes of
    * the same picture disagree in a few bits, unrelated pictures in
    * ~32). The DECODE step is stubbed per the multimodal contract:
    * "luminance samples" are the payload's byte values at 65 evenly
    * spaced offsets (pos_i = 1 + ⌊i·(L−1)/64⌋), standing in for the
    * resampled pixel grid — deterministic, so the whole sketch is
    * oracle-checkable; a real build computes the same 64 bits inside
    * [[decodeFeatures]]'s per-partition codec pass and nothing
    * downstream (banding, Hamming verify) changes.
    *
    * Implementation is a pure column expression (64 compare-and-weigh
    * terms over `ascii(substr(...))` samples — the SimHash32 fused-
    * vote discipline, whole-stage-codegen'd, zero shuffles): payloads
    * are ASCII here so byte = char code and the DuckDB mirror is
    * exact. Bit 63's weight is Long.MinValue — two's complement
    * addition of disjoint powers is bitwise OR in both engines.
    */
  def dHash64(textOfPayload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val len = length(textOfPayload).cast("long")
    // ⌊i·(L−1)/64⌋ exactly: the product is computed in LONG (a 32-bit
    // multiply would wrap for payloads past ~2³¹/64 chars) and stays
    // < 2⁵³, so the IEEE double division floors to the true integer
    // quotient; the final position is ≤ L, which fits int again
    def at(i: Int): org.apache.spark.sql.Column =
      ascii(
        textOfPayload.substr(
          (lit(1L) + floor((lit(i.toLong) * (len - lit(1L))) / lit(64)))
            .cast("int"),
          lit(1)
        )
      )
    (0 until 64)
      .map(i => when(at(i) < at(i + 1), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** The decode boundary: per-partition batch "decode" producing fixed
    * feature vectors. STUB: checksum/frame-count/features are
    * deterministic functions of the payload bytes, standing in for a
    * real codec + model forward pass.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open codec/model handle once per partition here
      rows.map { r =>
        val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feat = Array.tabulate(8)(i =>
          ((sum + i * 31) % 997).toFloat / 997.0f
        )
        MediaFeatures(
          r.media_id,
          r.payload.length,
          sum,
          (r.payload.length + 255) / 256, // ceil — consistent with frameOffsets
          feat
        )
      }
    }
  }
}
