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

  /** Sketch accuracy for q98 — far above every fixture's row count
    * (customer: 15K at sf0.1), so the Greenwald-Khanna summary never
    * compresses and the cuts are EXACT order statistics: that is what
    * makes the oracle reconstructible in SQL (the CountMin/HLL
    * pattern — mirror the sketch's read rule, here degenerate-exact).
    * At 100 TB the same knob simply stays a constant and the cuts
    * become ±1/accuracy-rank approximate; q37's spec-pinned ±1-tile
    * contract is the semantics statement for that regime.
    */
  private[ops] val NTILE_ACCURACY = 1000000

  /** q98: approximate ntile — q37's scale companion as a GATED query
    * (not only the ApproxNtileSpec contract). Same per-tile report as
    * q37 (count, min, max, decimal-exact sum per tile) but the tiles
    * come from [[ApproxNtile.bucketed]]: n−1 percentile_approx
    * cut-points (one aggregate pass, mergeable sketch), broadcast,
    * tile assigned map-side as 1 + |{cuts < v}| — no global-sort
    * window anywhere.
    *
    * Oracle parity: percentile_approx's exact-mode read returns the
    * sample at 1-based rank ⌈p·n⌉ (QuantileSummaries.query's
    * rank = ceil(quantile·count); verified empirically at n = 149,
    * 151, 997, 1499, 1500, 15000), and with NTILE_ACCURACY ≫ n the
    * summary holds every sample, so the DuckDB mirror reads the same
    * order statistic by row_number. p = i/4 is exact in binary, so
    * ⌈p·n⌉ has no float hazard at fixture sizes.
    */
  private val approxNtile: Q = (s, dir) => {
    import graft.ops.Qx.dsum
    ApproxNtile
      .bucketed(
        Tables(s, dir).customer.select(col("c_custkey"), col("c_acctbal")),
        col("c_acctbal"),
        4,
        NTILE_ACCURACY
      )
      .groupBy(col("tile"))
      .agg(
        count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        dsum(col("c_acctbal")).as("sum_bal")
      )
      .orderBy("tile")
  }

  /** q99: the exact↔approx ntile DISAGREEMENT, gated — q37's exact
    * tile next to q98's sketch tile per row, aggregated to the
    * (exact_tile, approx_tile) confusion cells. ApproxNtileSpec pins
    * the ±1-tile contract as a test; this row pins the measured
    * disagreement itself under the oracle gate, so a sketch
    * regression shows up as a changed confusion table, not only a
    * failed inequality. Off-diagonal cells are exactly the cut-
    * boundary ties the ApproxNtile scaladoc predicts (ntile splits
    * equal values by row order; a value-based cut cannot).
    *
    * The exact side is q37's global-sort window — sanctioned here for
    * the same reason as q37 itself: this query EXISTS to compare
    * against the exact anchor. The approx side and the join are
    * map-side + one dense key join.
    */
  private val ntileDisagreement: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val base = Tables(s, dir).customer.select(col("c_custkey"), col("c_acctbal"))
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val exact = base.select(
      col("c_custkey"),
      ntile(4).over(w).as("exact_tile")
    )
    val approx = ApproxNtile
      .bucketed(base, col("c_acctbal"), 4, NTILE_ACCURACY)
      .select(col("c_custkey"), col("tile").as("approx_tile"))
    exact
      .join(approx, "c_custkey")
      .groupBy(col("exact_tile"), col("approx_tile"))
      .agg(count(lit(1)).as("n"))
      .orderBy("exact_tile", "approx_tile")
  }

  val queries: Map[String, Q] = Map(
    "q95_join_key_profile" -> joinKeyProfile,
    "q96_segment_overlap" -> segmentOverlap,
    "q97_cooccurrence_lift" -> cooccurrence,
    "q98_approx_ntile" -> approxNtile,
    "q99_ntile_disagreement" -> ntileDisagreement
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
        |ORDER BY type_a, type_b""".stripMargin,
    "q98_approx_ntile" ->
      s"""$ntileSketchCtes
         |SELECT tile, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         |FROM ap GROUP BY tile ORDER BY tile""".stripMargin,
    "q99_ntile_disagreement" ->
      s"""$ntileSketchCtes,
         |ex AS (SELECT c_custkey,
         |    CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
         |      AS INTEGER) AS exact_tile
         |  FROM v)
         |SELECT ex.exact_tile, ap.tile AS approx_tile,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM ex JOIN ap USING (c_custkey)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  /** The ONE SQL mirror of the exact-mode sketch read, shared by q98
    * and q99 (the clusterCtes pattern — a drift between the two gates
    * would make them disagree about the same operator): cut(p) =
    * order statistic at 1-based rank ceil(p·n/4); ties collapse to
    * the same VALUE, so row_number's order among equal c_acctbal rows
    * is immaterial; tile = 1 + count(cuts strictly below the value).
    */
  private def ntileSketchCtes: String =
    """WITH v AS (SELECT c_custkey, c_acctbal FROM customer),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
      |ranked AS (SELECT c_acctbal,
      |    CAST(row_number() OVER (ORDER BY c_acctbal) AS BIGINT) AS rk
      |  FROM v),
      |p(i) AS (VALUES (1), (2), (3)),
      |cuts AS (SELECT p.i, r.c_acctbal AS c
      |  FROM p CROSS JOIN n
      |  JOIN ranked r ON r.rk = CAST(ceil(p.i * n.n / 4.0) AS BIGINT)),
      |ap AS (SELECT v.c_custkey, v.c_acctbal,
      |    CAST(1 + SUM(CASE WHEN v.c_acctbal > cuts.c THEN 1 ELSE 0 END)
      |      AS INTEGER) AS tile
      |  FROM v CROSS JOIN cuts
      |  GROUP BY v.c_custkey, v.c_acctbal)""".stripMargin
}
