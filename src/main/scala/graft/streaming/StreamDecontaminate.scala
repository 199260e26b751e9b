package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination on ingest — the stateless
  * stream form of batch `dedup10_decontaminate`: every arriving
  * document is scored against the held-out eval shingle set the
  * moment it enters the pipeline.
  *
  * The eval side of decontamination is a benchmark suite (MBs), so it
  * ships to every task as plan-embedded data — the streaming analogue
  * of dedup10's `broadcast(evalSet)` — and the whole operator is a
  * per-row expression over the fused codegen sketch: NO streaming
  * state, no watermark, works in append mode, cost O(|doc sketch| ·
  * log |eval set|) per document. For an eval set too big to embed,
  * swap the exact set for a bloom filter built over the same hashes
  * (false positives then quarantine a few extra docs for the exact
  * batch recheck — the standard two-tier design).
  *
  * `evalHashes` comes from [[evalHashSet]] on the static benchmark
  * table — a documented driver-side collect of the SMALL side, the
  * same sanctioned pattern as `cdc.MessageStore`'s serving reads.
  */
object StreamDecontaminate {

  /** Distinct shingle hashes of the eval/benchmark corpus. */
  def evalHashSet(evalDocs: DataFrame, textCol: String = "text"): Seq[Long] =
    evalDocs
      .select(
        explode(
          graft.plans.ShingleHashes(evalDocs.sparkSession, col(textCol))
        ).as("h")
      )
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSeq
      .sorted

  /** Per-document contamination score and flag; streaming-safe
    * (stateless, append mode) and equally valid on a batch frame.
    */
  def flagged(
      docs: DataFrame,
      evalHashes: Seq[Long],
      threshold: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    // staged once (multiply-referenced non-cheap alias, kept by
    // CollapseProject — the text01-03 discipline), then read twice
    docs
      .withColumn(
        "__nsh",
        size(
          array_intersect(
            graft.plans.ShingleHashes(spark, col(textCol)),
            typedLit(evalHashes)
          )
        )
      )
      .select(
        col(idCol),
        // size(NULL sketch) = -1; surface null text as null scores,
        // not a poisoned stream or a bogus -1
        when(col(textCol).isNotNull, col("__nsh")).as("n_shared"),
        when(col(textCol).isNotNull, col("__nsh") >= threshold)
          .as("contaminated")
      )
  }
}
