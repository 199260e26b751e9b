package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment: facts (purchases) tagged with the
  * latest dimension row (signup) at-or-before their event time — the
  * unbounded-lag counterpart of [[StreamJoins.purchaseAttribution]]
  * (which bounds lag so its state can evict) and the streaming
  * counterpart of the native batch [[graft.plans.AsOfJoin]] operator.
  *
  * State per key is O(1): exactly the current dimension winner
  * (latest-wins on (ts, seq), the Materializer's total order). Within
  * a micro-batch, rows are applied in (ts, seq) order, so a fact sees
  * every dimension update that precedes it in event time IN THE SAME
  * OR AN EARLIER BATCH. A dimension row arriving in a later batch
  * than a fact it should have enriched does NOT retro-enrich — that
  * is the documented streaming trade of unbounded-lag enrichment (a
  * retroactive exact answer needs the watermarked interval join or a
  * batch as-of over the log).
  *
  * Buffering note: each micro-batch's per-key group is sorted in
  * memory — bounded by batch size, not history (unlike a naive
  * full-history groupBy). In batch execution (where one "batch" IS
  * the history) this operator is the semantic reference; the sorted
  * merge `AsOfJoinExec` is the scale path.
  *
  * In batch mode the same code computes the exact backward as-of,
  * which is how `stream06_asof_enrich` is oracle-checked against the
  * q47-style window formulation.
  */
object StreamAsOf {

  /** One tagged input row: `kind` = "dim" (dimension update) or
    * "fact"; `seq` breaks equal-ts ties (source offset / event id). */
  final case class Tagged(
      user_id: Long,
      ts_us: Long,
      seq: Long,
      kind: String,
      value: Double
  )

  final case class DimState(ts_us: Long, seq: Long, value: Double)

  final case class Enriched(
      user_id: Long,
      ts_us: Long,
      seq: Long,
      value: Double,
      dim_ts_us: Option[Long],
      dim_value: Option[Double]
  )

  def enrich(events: Dataset[Tagged]): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DimState, Enriched](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (uid, it, state: GroupState[DimState]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.seq))
        var cur = state.getOption
        val out = sorted.flatMap { e =>
          if (e.kind == "dim") {
            // latest-wins: a dim older than the carried state loses
            if (
              cur.forall(c =>
                e.ts_us > c.ts_us || (e.ts_us == c.ts_us && e.seq >= c.seq)
              )
            ) cur = Some(DimState(e.ts_us, e.seq, e.value))
            None
          } else {
            Some(
              Enriched(uid, e.ts_us, e.seq, e.value, cur.map(_.ts_us), cur.map(_.value))
            )
          }
        }
        cur.foreach(state.update)
        out.iterator
      }
  }
}
