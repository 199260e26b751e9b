package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eleventh batch: pre-flight join economics and audience
  * segmentation — the two remaining "operate the engine" reports: a
  * key-frequency histogram that PREDICTS a join's output size and
  * skew before paying for it, and the bitmap-style segment-overlap
  * count behind every "users who did A and B but not C" question.
  */
object Relational11 {

  type Q = (SparkSession, String) => DataFrame

  /** q95: join-key frequency profile — the histogram a planner (or an
    * engineer about to launch a self-join) reads to predict cost: for
    * the events.user_id key, each row says "n_keys keys appear cnt
    * times"; `selfjoin_rows = n_keys·cnt²` is that stratum's exact
    * contribution to a user_id self-join's output (sessionization,
    * co-occurrence mining), and the histogram's tail is the skew
    * verdict — a single key with cnt ≈ 10⁶ predicts a 10¹²-row
    * straggler partition, the signal to salt (q76) or pre-aggregate
    * BEFORE the shuffle burns a day. Σ selfjoin_rows is the exact
    * |A ⋈ A| cardinality; the same arithmetic with two tables' per-key
    * counts gives |A ⋈ B| — computed from counts, never by joining.
    *
    * Shape at scale: one dense groupBy(user_id), then a ~log-sized
    * groupBy(cnt) — the profile costs one aggregation pass over key
    * counts, vs the join's quadratic blowup it predicts.
    */
  private val joinKeyProfile: Q = (s, dir) => {
    Tables(s, dir).events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_keys"))
      .select(
        col("cnt"),
        col("n_keys"),
        (col("cnt") * col("n_keys")).as("n_rows"),
        (col("cnt") * col("cnt") * col("n_keys")).as("selfjoin_rows")
      )
      .orderBy("cnt")
  }

  /** q96: segment-overlap counts — the audience/bitmap-index shape:
    * every user gets three membership flags (did they ever click /
    * purchase / error), and the output is the 2³-cell overlap table
    * ("clicked AND purchased but never errored" = the
    * (true,true,false) cell). The flags are per-user bool_or
    * aggregates — the row-store phrasing of a roaring-bitmap AND/OR —
    * and the result is the input to funnel triage, cohort sizing and
    * ad-audience estimation.
    *
    * Shape at scale: conditional flags fold into ONE dense
    * groupBy(user_id) (map-side partials, no distinct), then an
    * 8-key aggregate. The flags never materialize per event, and no
    * per-segment pass re-reads the table.
    */
  private val segmentOverlap: Q = (s, dir) => {
    Tables(s, dir).events
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "click", true).otherwise(false))
          .as("did_click"),
        max(when(col("event_type") === "purchase", true).otherwise(false))
          .as("did_purchase"),
        max(when(col("event_type") === "error", true).otherwise(false))
          .as("did_error")
      )
      .groupBy(col("did_click"), col("did_purchase"), col("did_error"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("did_click", "did_purchase", "did_error")
  }

  val queries: Map[String, Q] = Map(
    "q95_join_key_profile" -> joinKeyProfile,
    "q96_segment_overlap" -> segmentOverlap
  )

  val oracle: Map[String, String] = Map(
    "q95_join_key_profile" ->
      """WITH k AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY user_id)
        |SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(cnt * COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(cnt * cnt * COUNT(*) AS BIGINT) AS selfjoin_rows
        |FROM k GROUP BY cnt ORDER BY cnt""".stripMargin,
    "q96_segment_overlap" ->
      """WITH u AS (SELECT user_id,
        |    bool_or(event_type = 'click') AS did_click,
        |    bool_or(event_type = 'purchase') AS did_purchase,
        |    bool_or(event_type = 'error') AS did_error
        |  FROM events GROUP BY user_id)
        |SELECT did_click, did_purchase, did_error,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1, 2, 3
        |ORDER BY did_click, did_purchase, did_error""".stripMargin
  )
}
