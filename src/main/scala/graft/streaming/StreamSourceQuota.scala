package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-source token budgeting on INGEST — the stateful stream form of
  * batch `text13_source_quota`: as documents arrive, each source
  * accumulates its token total in the state store and stops admitting
  * documents the moment its quota is spent. This is the "cap every
  * domain at N tokens" pass run at collection time instead of as a
  * nightly batch — a crawler stops paying for a domain as soon as the
  * budget is gone.
  *
  * State per key is a single running Long (`flatMapGroupsWithState`,
  * no timeout): bounded by the number of DISTINCT SOURCES, not by
  * documents seen — the state store stays KBs at any corpus size.
  * Spent sources cost one state lookup per arriving doc and emit
  * nothing.
  *
  * Ordering contract: the batch form walks docs in doc_id order;
  * the stream form admits in ARRIVAL order (within a micro-batch,
  * doc_id order — the group's rows are sorted before folding). When
  * arrival order is ascending doc_id — the replay harness and any
  * log-ordered ingest guarantee this — the admitted set equals the
  * batch query's exactly (StreamSourceQuotaSpec); under out-of-order
  * arrival the quota still binds exactly, only WHICH docs consumed it
  * follows arrival rather than doc_id order.
  */
object StreamSourceQuota {

  final case class DocIn(doc_id: Long, source: String, n_tokens: Long)
  final case class DocKept(
      doc_id: Long,
      source: String,
      n_tokens: Long,
      cum_tokens: Long
  )

  /** Stage (doc_id, source, n_tokens) from a raw documents frame —
    * the same whitespace tokenizer as the batch query, map-side.
    */
  def tokenized(docs: DataFrame): Dataset[DocIn] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
      .select(
        col("doc_id"),
        col("source"),
        graft.functions.TextFunctions
          .tokenCountOf(col("__toks"))
          .cast("long")
          .as("n_tokens")
      )
      .as[DocIn]
  }

  /** Admit docs while their source's running token total stays within
    * `quota`. Works identically on a stream (state store) and, via
    * the same code path, in the replay spec.
    */
  def applyQuota(docs: Dataset[DocIn], quota: Long): Dataset[DocKept] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocKept](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (src, batch, state: GroupState[Long]) =>
        var cum = state.getOption.getOrElse(0L)
        // the running total counts EVERY doc seen (like the batch
        // window), so an over-quota doc spends budget without being
        // admitted — identical to filter(cum <= quota) over a running
        // sum that never resets
        val out = batch.toSeq.sortBy(_.doc_id).flatMap { d =>
          cum += d.n_tokens
          if (cum <= quota) Some(DocKept(d.doc_id, src, d.n_tokens, cum))
          else None
        }
        state.update(cum)
        out.iterator
      }
  }
}
