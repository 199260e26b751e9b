package graft.ops

import graft.Tables
import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second dedup batch: exact substring-span detection — the
  * position-aware complement to the set-based nets in
  * [[DedupQueries]]. MinHash/SimHash score whole documents; this
  * operator finds WHICH token ranges are copied (boilerplate
  * headers, license blocks, syndicated paragraphs) so a curation
  * pass can cut the span and keep the rest — the "deduplicating
  * training data" substring discipline, re-expressed as dataframe
  * passes instead of a suffix array.
  */
object DedupQueries2 {

  type Q = (SparkSession, String) => DataFrame

  /** Gram width in tokens (matches the 3-token shingle the set-based
    * operators use). At real scale this is 30-50 (the published
    * substring-dedup threshold); 3 binds on the fixture's short docs.
    */
  private[ops] val GRAM = 3

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism)

  /** dedup21: maximal duplicated token spans per document. A position
    * p is "duplicated" when the GRAM-token gram starting at p occurs
    * in ≥2 distinct documents; runs of consecutive duplicated
    * positions merge into maximal spans (an island detection: group
    * key = pos − row_number, constant exactly along a consecutive
    * run). Span token length = last_pos − first_pos + GRAM.
    *
    * Shape at scale: grams hash to 32-bit ints map-side, so the wire
    * carries (doc_id, pos, hash) — never text. One aggregation on the
    * hash finds cross-doc grams; the instance stream semi-joins back
    * on the same key (exchange reused); islands need one doc_id
    * shuffle whose window is bounded by document length. Adjacent
    * spans can share up to GRAM−1 tokens, so `dup_tokens` is an upper
    * estimate — deterministic and engine-identical.
    */
  private val substringSpans: Q = (s, dir) => {
    val d = Dedup.withTokens(docs(s, dir), "text")
    val inst = d
      .select(
        col("doc_id"),
        posexplode(
          when(
            size(col("__toks")) >= GRAM,
            transform(
              sequence(lit(0), size(col("__toks")) - GRAM),
              i =>
                concat_ws(
                  " ",
                  (0 until GRAM).map(k => element_at(col("__toks"), i + (k + 1))): _*
                )
            )
          ).otherwise(array().cast("array<string>"))
        )
      )
      .select(
        col("doc_id"),
        col("pos"),
        PortableHash.h32(col("col")).as("h")
      )
    val dup = inst
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("h")
    val hits = inst.join(dup, Seq("h"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = hits
      .withColumn("__grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(
        count(lit(1)).as("__n_grams"),
        (max(col("pos")) - min(col("pos")) + GRAM).cast("long").as("__span")
      )
    islands
      .groupBy(col("doc_id"))
      .agg(
        sum(col("__n_grams")).as("n_dup_grams"),
        count(lit(1)).as("n_spans"),
        max(col("__span")).as("max_span_tokens"),
        sum(col("__span")).as("dup_tokens")
      )
      .orderBy("doc_id")
  }

  /** PageRank rounds for dedup22, unrolled identically in the oracle.
    * The fixture graph's mass distribution stabilizes (to the output's
    * integer resolution) well within 3; at real scale rounds grow to
    * ~10-20 and the per-round cost is constant (see docstring).
    */
  private[ops] val PR_ROUNDS = 3

  /** Rank scale: ranks are integers in millionths (ppm). All
    * arithmetic is BIGINT add/multiply/floor-divide — mirrored
    * exactly by DuckDB's `//` — so the fixpoint iteration is
    * bit-identical on both engines with no float ever introduced.
    */
  private[ops] val PR_SCALE = 1000000L

  /** dedup22: PageRank over the confirmed near-dup graph — the
    * centrality ranking that picks CANONICAL documents: within a
    * duplicate cluster the highest-rank member is the one most
    * connected to the rest (the template origin, the most-mirrored
    * copy) and the natural survivor, while dedup13's survivor rule
    * (min doc_id) is arbitrary. Damping 0.85 in exact integer form:
    * r'(u) = 0.15·S + 0.85·Σ_{v∼u} floor(r(v)/deg(v)), with the 0.85
    * product computed as (85·x)/100 in BIGINT floor division.
    *
    * Shape at scale: textbook edge-partitioned message passing — each
    * round is one join of the (node, rank) table to the static edge
    * list plus one dense groupBy on the destination; the edge list is
    * checkpointed ONCE and reused every round (ranks re-derive, edges
    * don't), per-round state is O(nodes). Rounds are synchronous and
    * the discipline matches dedup06/dedup20: lineage cut per round,
    * superseded blocks released.
    */
  private val pagerank: Q = (s, dir) => {
    val e = DedupQueries
      .minhashVerified(s, dir)
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    // undirected: messages flow both ways
    val arcs = e
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(e.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = arcs
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("node"), lit(PR_SCALE).as("r"))
    for (_ <- 1 to PR_ROUNDS) {
      val contrib = ranks
        .join(deg, Seq("node"))
        // `div`: exact integer floor division (Column./ is double
        // division — correctly-rounded, but floor-after-round can
        // disagree with true floor at extreme magnitudes)
        .select(col("node"), expr("r div deg").as("c"))
      val inbox = arcs
        .join(contrib.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("m"))
      val next = deg
        .join(inbox, Seq("node"), "left")
        .select(
          col("node"),
          (lit(15L * PR_SCALE / 100) +
            expr(s"(85 * coalesce(m, 0L)) div 100"))
            .cast("long")
            .as("r")
        )
        .localCheckpoint(true)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(ranks)
      ranks = next
    }
    ranks
      .join(deg, Seq("node"))
      .select(col("node").as("doc_id"), col("deg"), col("r").as("rank_ppm"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "dedup21_substring_spans" -> substringSpans,
    "dedup22_pagerank" -> pagerank
  )

  private val normSql = TextQueriesSqlFragments.normSql
  private val minhashVerifiedOracle = DedupQueries.minhashVerifiedOracle

  val oracle: Map[String, String] = Map(
    "dedup21_substring_spans" ->
      s"""WITH prep AS (SELECT doc_id, $normSql AS norm,
         |        string_split($normSql, ' ') AS toks FROM documents),
         |i AS (SELECT doc_id, pos,
         |        ${PortableHash.sqlH32(
          (1 to GRAM).map(k => s"toks[pos+$k]").mkString(" || ' ' || ")
        )} AS h
         |      FROM (SELECT doc_id, toks,
         |              unnest(range(0, len(toks) - ${GRAM - 1})) AS pos
         |            FROM prep WHERE len(toks) >= $GRAM)),
         |dup AS (SELECT h FROM i GROUP BY h
         |        HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, pos FROM i
         |         WHERE h IN (SELECT h FROM dup)),
         |r AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id
         |          ORDER BY pos) AS grp
         |      FROM hits),
         |sp AS (SELECT doc_id, grp, COUNT(*) AS n_grams,
         |         MAX(pos) - MIN(pos) + $GRAM AS span
         |       FROM r GROUP BY doc_id, grp)
         |SELECT doc_id,
         |  CAST(SUM(n_grams) AS BIGINT) AS n_dup_grams,
         |  COUNT(*) AS n_spans,
         |  CAST(MAX(span) AS BIGINT) AS max_span_tokens,
         |  CAST(SUM(span) AS BIGINT) AS dup_tokens
         |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // rounds unrolled as MATERIALIZED CTEs (the dedup20 discipline:
    // inlined, each round would re-expand the MinHash pipeline)
    "dedup22_pagerank" -> {
      val rounds = (1 to PR_ROUNDS).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS MATERIALIZED (
           |  SELECT $prev.node, $prev.r // deg.deg AS c
           |  FROM $prev JOIN deg ON $prev.node = deg.node),
           |m$i AS MATERIALIZED (
           |  SELECT arcs.dst AS node, CAST(SUM(c$i.c) AS BIGINT) AS m
           |  FROM arcs JOIN c$i ON arcs.src = c$i.node
           |  GROUP BY arcs.dst),
           |r$i AS MATERIALIZED (
           |  SELECT deg.node,
           |    CAST(${15L * PR_SCALE / 100}
           |      + (85 * COALESCE(m$i.m, 0)) // 100 AS BIGINT) AS r
           |  FROM deg LEFT JOIN m$i ON deg.node = m$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH mh AS MATERIALIZED ($minhashVerifiedOracle),
         |e AS MATERIALIZED (SELECT id_a, id_b FROM mh WHERE jac >= 0.5),
         |arcs AS MATERIALIZED (
         |  SELECT id_a AS src, id_b AS dst FROM e
         |  UNION ALL SELECT id_b, id_a FROM e),
         |deg AS MATERIALIZED (
         |  SELECT src AS node, COUNT(*) AS deg FROM arcs GROUP BY src),
         |r0 AS MATERIALIZED (SELECT node, CAST($PR_SCALE AS BIGINT) AS r
         |  FROM deg),
         |$rounds
         |SELECT deg.node AS doc_id, deg.deg, r$PR_ROUNDS.r AS rank_ppm
         |FROM deg JOIN r$PR_ROUNDS ON deg.node = r$PR_ROUNDS.node
         |ORDER BY doc_id""".stripMargin
    }
  )
}
