package graft.ops

import graft.Tables
import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** The (doc_id, pos, int32 gram-hash) instance stream shared by
    * dedup21/dedup29 — ONE definition so the span report and the
    * scrub can never disagree on gram extraction or hashing.
    */
  private def gramInstances(s: SparkSession, dir: String): DataFrame =
    Dedup
      .withTokens(docs(s, dir), "text")
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

  private val substringSpans: Q = (s, dir) => {
    val inst = gramInstances(s, dir)
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

  /** dedup29: ExactSubstr-style span scrub with text RECONSTRUCTION
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better" — the remove-all-but-one-occurrence discipline).
    * dedup21 only REPORTS duplicated spans; this operator applies the
    * cut: every duplicated gram keeps its first-owner occurrence
    * (owner = min doc_id over the gram's holders — the text25
    * attribution rule) and is scrubbed everywhere else, scrubbed
    * positions merge into maximal spans, and each document's clean
    * text is rebuilt from the surviving tokens in original order.
    *
    * Shape at scale: the published algorithm builds a corpus suffix
    * array; this is the gram-hash dataframe form — instances are
    * (doc_id, pos, int32 hash) map-side, ownership is ONE dense hash
    * aggregation, spans need one doc_id window bounded by document
    * length. Only the final reconstruction touches text again: the
    * span table (a small fraction of the corpus — it holds only
    * scrubbed RANGES, ~2 longs per span) joins back to the documents
    * on doc_id, and the token filter is a per-row higher-order
    * expression — the corpus shuffles at most once, carrying spans
    * rather than copies of the text. Coverage semantics: token index
    * i is cut when ANY scrubbed gram [p, p+GRAM-1] covers it, so
    * overlap double-counting cannot occur (union-of-intervals, not
    * sum).
    */
  private val spanScrub: Q = (s, dir) => {
    val d = Dedup.withTokens(docs(s, dir), "text")
    val inst = gramInstances(s, dir)
    // ownership: first holder (min doc_id) of each cross-doc gram
    val own = inst
      .groupBy(col("h"))
      .agg(
        countDistinct(col("doc_id")).as("__nd"),
        min(col("doc_id")).as("owner")
      )
      .filter(col("__nd") >= 2)
      .select("h", "owner")
    // scrub hits: occurrences of a duplicated gram OUTSIDE its owner
    val hits = inst
      .join(own, Seq("h"))
      .filter(col("doc_id") =!= col("owner"))
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      .withColumn("__grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(
        min(col("pos")).as("lo"),
        (max(col("pos")) + GRAM - 1).as("hi")
      )
      .groupBy(col("doc_id"))
      // collect order is partition-nondeterministic, but the spans
      // only feed an order-independent coverage test (exists)
      .agg(collect_list(struct(col("lo"), col("hi"))).as("__spans"))
    val emptySpans = array().cast("array<struct<lo:int,hi:int>>")
    d.join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tok"),
        filter(
          col("__toks"),
          (_, i) =>
            !exists(
              coalesce(col("__spans"), emptySpans),
              sp => i >= sp("lo") && i <= sp("hi")
            )
        ).as("__kept")
      )
      .select(
        col("doc_id"),
        col("n_tok"),
        size(col("__kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("__kept")).as("clean_text")
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

  /** dedup23: the LSH operating curve — expected recall of every
    * (bands b × rows r) split of the K=32 MinHash budget, evaluated
    * against the measured Jaccard distribution of the engine's own
    * confirmed near-dups. This is the query run BEFORE committing an
    * LSH config at a new scale: detection probability for a pair at
    * similarity j is 1 − (1 − j^r)^b, so the same 32 hashes buy high
    * recall at j≥0.5 with (8,4) but only coin-flip recall with
    * (32,1); the table quantifies that trade on the corpus's actual
    * duplicate population instead of a textbook curve.
    *
    * Determinism: every config's b and r is a power of two, so j^r
    * and (1−x)^b evaluate by REPEATED SQUARING — fixed chains of
    * IEEE multiplies, no libm pow — and per-pair probabilities are
    * rounded once and summed as DECIMAL (the text20 discipline), so
    * the mean is order- and partition-independent.
    *
    * Shape at scale: reuses the verified-pairs pipeline (the jac
    * distribution is already materialized by dedup04's discipline);
    * per pair the four configs are a map-side stack; the aggregate
    * keys on 4 config labels.
    */
  private val lshCurve: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    def sq(c: Column, times: Int): Column =
      (1 to times).foldLeft(c)((acc, _) => acc * acc)
    val j = col("jac")
    // p(b, r) = 1 − (1 − j^r)^b, b·r = 32, all powers of two
    val configs = Seq(
      ("04x8", sq(j, 3), 2), // r=8 = j^(2^3), b=4 = ^(2^2)
      ("08x4", sq(j, 2), 3),
      ("16x2", sq(j, 1), 4),
      ("32x1", j, 5)
    )
    val pairs = DedupQueries
      .minhashVerified(s, dir)
      .filter(col("jac") >= 0.5)
    val stacked = pairs.select(
      explode(
        array(configs.map { case (name, jr, bLog) =>
          struct(
            lit(name).as("config"),
            (lit(1.0) - sq(lit(1.0) - jr, bLog)).as("p")
          )
        }: _*)
      ).as("c")
    )
    stacked
      .select(col("c.config").as("config"), col("c.p").as("p"))
      .groupBy(col("config"))
      .agg(
        count(lit(1)).as("n_pairs"),
        // pico-unit quantization, not round(x,12) — the text20 class
        (sum(floor(col("p") * lit(1e12) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e12) / count(lit(1)))
          .as("expected_recall")
      )
      .orderBy("config")
  }

  /** dedup24: the 64-bit/16-bit-band SimHash near-dup — the SCALE
    * form dedup07's in-code note names (at ~10⁹ docs a 32-bit sketch
    * saturates: random-pair Hamming distances concentrate at 16±4 and
    * separation collapses; 64 bits restores the margin, and 16-bit
    * band keys cut per-bucket collision mass by ~256× at the same
    * band count). Identical discipline to dedup07: sketch computed
    * ONCE by a fused codegen expression, carried through the single
    * bucketedPairs shuffle as a struct member, Hamming verify reads
    * it straight off the pair — zero re-attach joins. Pigeonhole: a
    * pair within Hamming ≤ 3 shares at least one of the 4 bands with
    * certainty; the ≤ 16 threshold mirrors dedup07's 8/32 ratio.
    */
  private val simhash64Bands: Q = (s, dir) => {
    val d = docs(s, dir)
      .select(
        col("doc_id"),
        graft.plans.SimHash64(s, col("text")).as("__sh64")
      )
    val bands = d.select(
      struct(col("doc_id"), col("__sh64")).as("m"),
      posexplode_outer(
        array((0 until 4).map(b =>
          shiftright(col("__sh64"), 16 * b).bitwiseAND(lit(65535L))
        ): _*)
      ).as(Seq("band", "key"))
    )
    PairJoins
      .bucketedPairs(bands, Seq("band", "key"), "m")
      .select(
        col("id_a.doc_id").as("id_a"),
        col("id_b.doc_id").as("id_b"),
        Dedup
          .hamming(col("id_a.__sh64"), col("id_b.__sh64"))
          .as("hamming")
      )
      .filter(col("hamming") <= 16)
      .orderBy("id_a", "id_b")
  }

  /** Sketch size for dedup25. k=128 puts the KMV Jaccard estimator's
    * standard error around 1/√k ≈ 0.09 — tight enough to rank source
    * pairs; the sketch table is n_sources·k longs regardless of
    * corpus size.
    */
  private[ops] val KMV_K = 128

  /** dedup25: cross-source shingle overlap estimated from bottom-k
    * (KMV) sketches — the sketch form of dedup16's exact contamination
    * matrix. dedup16 answers "how many CONFIRMED near-dup pairs cross
    * sources" by running the full LSH discipline; this query answers
    * the coarser planning question — "which source pairs share
    * n-gram mass at all, and roughly how much" — without EVER forming
    * candidate pairs: each source reduces to its k smallest distinct
    * shingle hashes, and for a pair (A, B) the standard KMV estimate
    * ĵ = |U ∩ Â ∩ B̂| / |U| (U = bottom-k of Â ∪ B̂) is computed on
    * the k-sized sketches alone.
    *
    * Shape at scale: the tokenize→shingle→md5 generator runs once
    * map-side; what shuffles is (source, h) pairs already reduced by
    * the aggregator's map-side partial to ≤ k longs PER SOURCE PER
    * PARTITION ([[graft.sim.BottomKSketch]] — never the instance
    * stream, never text). The sketch table (n_sources rows × k longs)
    * broadcasts into a sources² pair comparison that is constant-cost
    * at any corpus size. Every number is integer-exact; the one IEEE
    * division per pair is engine-identical.
    */
  private val kmvOverlap: Q = (s, dir) => {
    import s.implicits._
    val d = Dedup.withShingleHashes(
      Dedup.withShingles(Dedup.withTokens(docs(s, dir), "text"))
    )
    val inst = d
      // explode_outer: the text25 barrier against
      // InferFiltersFromGenerate re-inlining the shingle pipeline
      .select(col("source"), explode_outer(array_distinct(col("__shh"))).as("h"))
      .filter(col("h").isNotNull)
      .as[(String, Long)]
    val sk = inst
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.sim.BottomKSketch.bottomK(KMV_K).toColumn.name("sk"))
      .toDF("source", "sk")
    val a = sk.select(col("source").as("source_a"), col("sk").as("sk_a"))
    val b = sk.select(col("source").as("source_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .withColumn(
        "__u",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, KMV_K)
      )
      .select(
        col("source_a"),
        col("source_b"),
        size(col("__u")).cast("long").as("k_union"),
        size(array_intersect(array_intersect(col("__u"), col("sk_a")), col("sk_b")))
          .cast("long")
          .as("n_common"),
        (size(array_intersect(array_intersect(col("__u"), col("sk_a")), col("sk_b")))
          .cast("double") / size(col("__u")))
          .as("jac_est")
      )
      .orderBy("source_a", "source_b")
  }

  /** Hop cap for dedup26. Termination comes from the `lvl < KHOP`
    * guard — Spark 4.1's recursive CTEs support UNION ALL only
    * (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`), so the unbounded
    * fixpoint form stays with the native iterative operators
    * (dedup06/08); bounded-depth expansion is exactly what recursive
    * SQL does support, in both engines, with identical text.
    */
  private[ops] val KHOP = 3

  /** dedup26: k-hop duplicate neighborhood via a RECURSIVE CTE on the
    * SQL surface (Spark 4.1 `WITH RECURSIVE` → `UnionLoop`): for each
    * document, how many distinct documents its confirmed near-dup
    * edges reach within ≤ 3 hops, and how many paths get there — the
    * "how far does this template spread" QA metric next to dedup19's
    * clustering coefficient (1-hop) and dedup20's k-core (global),
    * and the library's demonstration that the recursive-SQL surface
    * is available for users who write it.
    *
    * Shape at scale: each recursion level is one equi-join of the
    * frontier against the edge list plus the level guard — the same
    * per-round cost as the native iterative operators, but WITHOUT
    * their lineage-cut/checkpoint discipline (UnionLoop re-derives
    * the loop internally) and with path-multiplicity growth in dense
    * clusters; the depth cap bounds both. Unbounded closure stays
    * with dedup06/08.
    */
  private val khopNeighborhood: Q = (s, dir) => {
    val e = DedupQueries
      .minhashVerified(s, dir)
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"))
    e.unionByName(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .createOrReplaceTempView("khop_edges")
    docs(s, dir).select(col("doc_id")).createOrReplaceTempView("khop_docs")
    s.sql(s"""
      WITH RECURSIVE hop(id, start, lvl) AS (
        SELECT doc_id, doc_id, 0 FROM khop_docs
        UNION ALL
        SELECT e.id_b, h.start, h.lvl + 1
        FROM hop h JOIN khop_edges e ON e.id_a = h.id
        WHERE h.lvl < $KHOP
      )
      SELECT start AS doc_id,
        CAST(COUNT(DISTINCT id) - 1 AS BIGINT) AS n_within_k,
        CAST(COUNT(*) - 1 AS BIGINT) AS n_paths_k
      FROM hop GROUP BY start ORDER BY doc_id
    """)
  }

  val queries: Map[String, Q] = Map(
    "dedup26_khop_recursive" -> khopNeighborhood,
    "dedup21_substring_spans" -> substringSpans,
    "dedup29_span_scrub" -> spanScrub,
    "dedup22_pagerank" -> pagerank,
    "dedup23_lsh_curve" -> lshCurve,
    "dedup24_simhash64" -> simhash64Bands,
    "dedup25_kmv_overlap" -> kmvOverlap
  )

  private val normSql = TextQueriesSqlFragments.normSql
  private val minhashVerifiedOracle = DedupQueries.minhashVerifiedOracle

  val oracle: Map[String, String] = Map(
    "dedup26_khop_recursive" ->
      s"""WITH RECURSIVE mh AS MATERIALIZED ($minhashVerifiedOracle),
         |e AS (SELECT id_a, id_b FROM mh WHERE jac >= 0.5
         |      UNION ALL SELECT id_b, id_a FROM mh WHERE jac >= 0.5),
         |hop(id, start, lvl) AS (
         |  SELECT doc_id, doc_id, 0 FROM documents
         |  UNION ALL
         |  SELECT e.id_b, h.start, h.lvl + 1
         |  FROM hop h JOIN e ON e.id_a = h.id
         |  WHERE h.lvl < $KHOP)
         |SELECT start AS doc_id,
         |  CAST(COUNT(DISTINCT id) - 1 AS BIGINT) AS n_within_k,
         |  CAST(COUNT(*) - 1 AS BIGINT) AS n_paths_k
         |FROM hop GROUP BY start ORDER BY doc_id""".stripMargin,
    "dedup25_kmv_overlap" ->
      s"""WITH prep AS (SELECT doc_id, source, $normSql AS norm,
         |        string_split($normSql, ' ') AS toks FROM documents),
         |sh AS (SELECT source,
         |         unnest(${TextQueriesSqlFragments.shinglesSql}) AS sh
         |       FROM prep),
         |i AS (SELECT DISTINCT source,
         |        ${PortableHash.sqlH32("sh")} AS h FROM sh),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM i),
         |skl AS (SELECT source, list_sort(list(h)) AS sk
         |        FROM r WHERE rn <= $KMV_K GROUP BY source),
         |p AS (SELECT a.source AS source_a, b.source AS source_b,
         |        list_slice(list_sort(list_distinct(
         |          list_concat(a.sk, b.sk))), 1, $KMV_K) AS u,
         |        a.sk AS ska, b.sk AS skb
         |      FROM skl a JOIN skl b ON a.source < b.source)
         |SELECT source_a, source_b,
         |  CAST(len(u) AS BIGINT) AS k_union,
         |  CAST(len(list_intersect(list_intersect(u, ska), skb))
         |    AS BIGINT) AS n_common,
         |  CAST(len(list_intersect(list_intersect(u, ska), skb)) AS DOUBLE)
         |    / len(u) AS jac_est
         |FROM p ORDER BY source_a, source_b""".stripMargin,
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
    // same gram/ownership pipeline; the reconstruction is expressed
    // as a NOT-EXISTS range probe per token + ordered string_agg
    // (the dataframe side's higher-order filter, in join form)
    "dedup29_span_scrub" ->
      s"""WITH prep AS (SELECT doc_id, $normSql AS norm,
         |        string_split($normSql, ' ') AS toks FROM documents),
         |i AS (SELECT doc_id, pos,
         |        ${PortableHash.sqlH32(
          (1 to GRAM).map(k => s"toks[pos+$k]").mkString(" || ' ' || ")
        )} AS h
         |      FROM (SELECT doc_id, toks,
         |              unnest(range(0, len(toks) - ${GRAM - 1})) AS pos
         |            FROM prep WHERE len(toks) >= $GRAM)),
         |own AS (SELECT h, MIN(doc_id) AS owner FROM i GROUP BY h
         |        HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT i.doc_id, i.pos FROM i
         |         JOIN own ON i.h = own.h
         |         WHERE i.doc_id <> own.owner),
         |r AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id
         |          ORDER BY pos) AS grp
         |      FROM hits),
         |sp AS (SELECT doc_id, MIN(pos) AS lo,
         |         MAX(pos) + ${GRAM - 1} AS hi
         |       FROM r GROUP BY doc_id, grp),
         |tok AS (SELECT doc_id, toks,
         |          unnest(range(0, len(toks))) AS ti
         |        FROM prep),
         |kept AS (SELECT t.doc_id, t.ti, t.toks[t.ti + 1] AS tk
         |         FROM tok t
         |         WHERE NOT EXISTS (SELECT 1 FROM sp
         |           WHERE sp.doc_id = t.doc_id
         |             AND t.ti BETWEEN sp.lo AND sp.hi)),
         |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
         |          string_agg(tk, ' ' ORDER BY ti) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT prep.doc_id,
         |  CAST(len(prep.toks) AS BIGINT) AS n_tok,
         |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
         |  COALESCE(agg.clean_text, '') AS clean_text
         |FROM prep LEFT JOIN agg USING (doc_id)
         |ORDER BY prep.doc_id""".stripMargin,
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
    },
    "dedup24_simhash64" -> {
      def voteSql(arr: String, j: Int, bit: Int) =
        s"""(CASE WHEN list_aggregate(list_transform($arr,
           |  h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') >= 0
           |  THEN CAST(${1L << bit} AS BIGINT) ELSE 0 END)""".stripMargin
      val sh64 =
        ((0 until 32).map(j => voteSql("tokh", j, j)) ++
          (0 until 32).map(j => voteSql("tokh2", j, 32 + j)))
          .mkString("(", " + ", ")")
      s"""WITH prep AS (SELECT doc_id, $normSql AS norm,
         |        string_split($normSql, ' ') AS toks FROM documents),
         |tokh AS (SELECT doc_id,
         |    list_transform(toks, t -> ${PortableHash.sqlH32("t")}) AS tokh,
         |    list_transform(toks, t -> ${PortableHash.sqlH32("t", 1)}) AS tokh2
         |  FROM prep),
         |t AS (SELECT doc_id, $sh64 AS sh FROM tokh),
         |band AS (SELECT doc_id, sh, r.b AS band,
         |           (sh >> (r.b * 16)) & 65535 AS key
         |         FROM t CROSS JOIN range(0, 4) r(b)),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM band a JOIN band b
         |            ON a.band = b.band AND a.key = b.key
         |           AND a.doc_id < b.doc_id)
         |SELECT p.id_a, p.id_b, bit_count(xor(a.sh, b.sh)) AS hamming
         |FROM pairs p
         |JOIN t a ON a.doc_id = p.id_a
         |JOIN t b ON b.doc_id = p.id_b
         |WHERE bit_count(xor(a.sh, b.sh)) <= 16
         |ORDER BY id_a, id_b""".stripMargin
    },
    "dedup23_lsh_curve" -> {
      def sqSql(e: String, times: Int): String =
        (1 to times).foldLeft(e)((acc, _) => s"($acc * $acc)")
      val branches = Seq(("04x8", 3, 2), ("08x4", 2, 3), ("16x2", 1, 4), ("32x1", 0, 5))
        .map { case (name, rLog, bLog) =>
          val jr = sqSql("jac", rLog)
          val p = s"(1.0 - ${sqSql(s"(1.0 - $jr)", bLog)})"
          s"SELECT '$name' AS config, $p AS p FROM tp"
        }
        .mkString("\n  UNION ALL ")
      s"""WITH mh AS MATERIALIZED ($minhashVerifiedOracle),
         |tp AS (SELECT jac FROM mh WHERE jac >= 0.5),
         |u AS (
         |  $branches)
         |SELECT config, COUNT(*) AS n_pairs,
         |  CAST(CAST(SUM(CAST(floor(p * 1000000000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS DOUBLE)
         |    / 1000000000000.0 / COUNT(*) AS expected_recall
         |FROM u GROUP BY config ORDER BY config""".stripMargin
    }
  )
}
