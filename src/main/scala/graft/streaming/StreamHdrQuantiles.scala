package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming grouped quantiles via the HDR sketch as sink-owned state
  * — the latency-dashboard feed (p50/p99 per key, continuously
  * updated) built from q85/q88's bucket construction: per-(group,
  * bucket) COUNTS are the whole state, merged across micro-batches by
  * plain addition — associative and commutative, so any slicing and
  * any arrival order land on the same sketch; state is bounded at
  * ~1K rows per group REGARDLESS of feed length or value cardinality.
  *
  * (Unlike the register MAX of [[StreamWindowHll]], count addition is
  * NOT idempotent — exactly-once delivery into the fold is the
  * contract, which foreachBatch's batchId-checkpoint handshake
  * provides; an at-least-once source would need per-batch dedup
  * first, stream10's discipline.)
  *
  * The serving read is `Relational10.hdrTargets` over the accumulated
  * counts: rank + bucket lower bound per (group, quantile) — within
  * 2^-S of the true order statistic by construction. The EXACT
  * selection pass (q85/q88's second scan) is a batch affair over the
  * stored feed; a streaming sink serves the sketch bound.
  */
object StreamHdrQuantiles {

  final class State(private[streaming] val spark: SparkSession) {
    @volatile private[streaming] var counts: Option[DataFrame] = None

    private[streaming] def merge(batchCounts: DataFrame, groupCols: Seq[String]): Unit = {
      val merged = counts match {
        case None => batchCounts
        case Some(cur) =>
          cur
            .unionByName(batchCounts)
            .groupBy((groupCols ++ Seq("bucket", "pw")).map(col): _*)
            .agg(sum(col("cnt")).as("cnt"))
      }
      val next = merged.localCheckpoint(true)
      counts.foreach(
        org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(_)
      )
      counts = Some(next)
    }

    def close(): Unit = {
      counts.foreach(
        org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(_)
      )
      counts = None
    }
  }

  def newState(spark: SparkSession): State = new State(spark)

  /** Fold one micro-batch (groupCols + BIGINT `v`) into the sketch. */
  def ingest(state: State, batch: DataFrame, groupCols: Seq[String]): Unit =
    state.merge(graft.ops.Relational10.hdrBucketCounts(batch, groupCols), groupCols)

  /** Deterministic replay sliced by `sliceCol` mod `slices`; returns
    * the (group, p, r, est) quantile read over the final sketch.
    */
  def replay(
      values: DataFrame,
      groupCols: Seq[String],
      sliceCol: String,
      slices: Int = 5
  ): DataFrame = {
    val state = newState(values.sparkSession)
    (0 until slices).foreach { i =>
      ingest(
        state,
        values.filter(pmod(col(sliceCol), lit(slices)) === i).drop(sliceCol),
        groupCols
      )
    }
    val read = graft.ops.Relational10
      .hdrTargets(state.counts.get, groupCols)
      .select((groupCols ++ Seq("p", "r", "est")).map(col): _*)
      .localCheckpoint(true)
    state.close()
    read
  }
}
