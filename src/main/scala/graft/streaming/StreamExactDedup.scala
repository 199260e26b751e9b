package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EXACT dedup on ingest — the stream form of batch
  * `dedup01`'s fingerprint-distinct: the first document with a given
  * normalized fingerprint passes, every later copy is dropped as it
  * arrives.
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry
  * per distinct fingerprint and — unlike a plain `dropDuplicates` on
  * a stream, whose state grows forever — entries expire once the
  * watermark passes their event time, so state is bounded by the
  * dedup horizon (the window in which a re-crawl realistically
  * re-sends a doc), not by corpus lifetime. That horizon/exactness
  * trade is the standard production posture; pair it with a periodic
  * batch `dedup01` sweep for cross-horizon copies.
  *
  * Key choice: the fingerprint EXPRESSION (normalized-text hash), not
  * doc_id — the same identity the batch operator uses, computed
  * map-side before the dedup state lookup. The state key is the
  * shuffle key; fingerprints are uniform hashes, so the state
  * partitioning is skew-free by construction.
  */
object StreamExactDedup {

  /** Normalized-content fingerprint shared with the batch dedup:
    * lowercase, collapse whitespace, portable hash. */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PortableHash.h32(
      regexp_replace(lower(trim(text)), "\\s+", " ")
    )

  /** `docs` must carry `ts` (event time), `doc_id`, `text`. Emits the
    * surviving rows (first arrival per fingerprint inside the
    * watermark horizon) with the fingerprint attached.
    */
  def dedup(docs: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
