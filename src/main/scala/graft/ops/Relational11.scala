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

  /** q97: event-type co-occurrence with lift — the association-rule /
    * PMI shape behind "users who do A also do B": for every unordered
    * type pair, how many users did both, and the lift
    * n_ab·N / (n_a·n_b) (>1 = positively associated). Lift rather
    * than log-PMI keeps the arithmetic libm-free: exact BIGINT counts
    * and ONE closing IEEE division per row, bit-identical across
    * engines.
    *
    * Shape at scale: the per-user distinct collapses events to
    * ≤ |type domain| rows per user (ONE dense shuffle); the pair
    * self-join fans out ≤ C(types,2) per user — bounded by the
    * DOMAIN, not activity; marginals and the pair counts are
    * tiny-key aggregates, and N rides a one-row broadcast.
    */
  private val cooccurrence: Q = (s, dir) => {
    val u = Tables(s, dir).events
      .select(col("user_id"), col("event_type"))
      .distinct()
    val n = u.select(col("user_id")).distinct().agg(count(lit(1)).as("__n"))
    val singles = u
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("__cnt"))
    val pairs = u
      .select(col("user_id"), col("event_type").as("type_a"))
      .join(
        u.select(col("user_id"), col("event_type").as("type_b")),
        "user_id"
      )
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(
        broadcast(singles.select(col("event_type").as("type_a"), col("__cnt").as("n_a"))),
        "type_a"
      )
      .join(
        broadcast(singles.select(col("event_type").as("type_b"), col("__cnt").as("n_b"))),
        "type_b"
      )
      .crossJoin(broadcast(n))
      .select(
        col("type_a"),
        col("type_b"),
        col("n_a"),
        col("n_b"),
        col("n_ab"),
        ((col("n_ab") * col("__n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift")
      )
      .orderBy("type_a", "type_b")
  }

  val queries: Map[String, Q] = Map(
    "q95_join_key_profile" -> joinKeyProfile,
    "q96_segment_overlap" -> segmentOverlap,
    "q97_cooccurrence_lift" -> cooccurrence
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
        |ORDER BY did_click, did_purchase, did_error""".stripMargin,
    "q97_cooccurrence_lift" ->
      """WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        |      FROM u),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM u GROUP BY event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_ab
        |      FROM u a JOIN u b
        |        ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, sa.cnt AS n_a, sb.cnt AS n_b, p.n_ab,
        |  CAST(p.n_ab * n.n AS DOUBLE) / CAST(sa.cnt * sb.cnt AS DOUBLE)
        |    AS lift
        |FROM p
        |JOIN s sa ON sa.event_type = p.type_a
        |JOIN s sb ON sb.event_type = p.type_b
        |CROSS JOIN n
        |ORDER BY type_a, type_b""".stripMargin
  )
}
