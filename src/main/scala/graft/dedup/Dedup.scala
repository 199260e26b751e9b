package graft.dedup

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for the training-data pipeline surface:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard
  * verification.
  *
  * Scale design:
  *   - Heavy per-row derivations (token list, shingle set, shingle
  *     hashes, signatures) are materialized as explicit projection
  *     stages, NOT inlined expression trees: higher-order functions
  *     are interpreted (no codegen), so an inlined subtree would be
  *     re-evaluated once per lambda element. Staged columns are
  *     evaluated once per row.
  *   - One md5 per shingle; the k MinHash permutations come from a
  *     universal-hash family h_s(x) = (a_s·x + b_s) mod p over that
  *     single base hash — the standard trick, and ~k× cheaper than
  *     k independent string hashes.
  *   - Candidate generation shuffles once on the band signature;
  *     only candidates (≪ n²) reach the Jaccard verify join.
  */
object Dedup {

  /** Mersenne-ish prime > 2^32 for the permutation family. */
  val P: Long = 4294967311L

  /** Deterministic (a_s, b_s) per permutation, derived from the
    * portable hash so the DuckDB oracle regenerates them exactly.
    * a_s < 2^30 keeps h·a_s + b_s within int64 (h < 2^32).
    */
  def permCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { s =>
      (
        2L * (PortableHash.h32Local(s"a:$s") % 500000000L) + 1L,
        PortableHash.h32Local(s"b:$s")
      )
    }

  /** Stage 1: normalized text + token list. */
  def withTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__norm", TextFunctions.normalized(col(textCol)))
      .withColumn("__toks", split(col("__norm"), " "))

  /** Stage 2: distinct 3-word shingles ("__sh"); <3-token docs fall
    * back to the whole normalized text. Requires stage 1.
    */
  def withShingles(df: DataFrame): DataFrame =
    df.withColumn(
      "__sh",
      when(size(col("__toks")) < 3, array(col("__norm"))).otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(col("__toks")) - 3),
            i =>
              concat_ws(
                " ",
                element_at(col("__toks"), i + 1),
                element_at(col("__toks"), i + 2),
                element_at(col("__toks"), i + 3)
              )
          )
        )
      )
    )

  /** Stage 3: one portable 32-bit hash per shingle ("__shh"). */
  def withShingleHashes(df: DataFrame): DataFrame =
    df.withColumn("__shh", transform(col("__sh"), sh => PortableHash.h32(sh)))

  /** Stage 4: k-permutation MinHash signature ("__sig") via the
    * universal-hash family over the base hashes. Requires stage 3.
    */
  def withMinHashSignature(df: DataFrame, k: Int): DataFrame = {
    val coeffs = permCoeffs(k)
    df.withColumn(
      "__sig",
      array(coeffs.map { case (a, b) =>
        array_min(
          transform(col("__shh"), h => pmod(h * lit(a) + lit(b), lit(P)))
        )
      }: _*)
    )
  }

  /** Full shingle pipeline from raw text. */
  def prepared(df: DataFrame, textCol: String): DataFrame =
    withShingleHashes(withShingles(withTokens(df, textCol)))

  /** LSH band signatures column from "__sig". */
  def bandSignature(sig: Column, band: Int, rowsPerBand: Int): Column =
    PortableHash.h32(
      concat_ws(",", slice(sig, band * rowsPerBand + 1, rowsPerBand))
    )

  /** MinHash signature via explode + hash aggregation: per-shingle
    * hashes explode to rows, the k permutation mins are codegen'd
    * `min` aggregates (whole-stage Tungsten), reassembled into the
    * "__sig" array. Same values as [[withMinHashSignature]], but the
    * hot loop runs generated code instead of interpreted lambdas
    * (~5× at sf0.1). One extra shuffle on the id — map-side combine
    * keeps it small (k longs per id).
    */
  def minHashSignatureAgg(df: DataFrame, idCol: String, k: Int): DataFrame = {
    val coeffs = permCoeffs(k)
    // explode_outer, deliberately: plain explode triggers
    // InferFiltersFromGenerate, which injects a size()>0 filter holding
    // two copies of the whole upstream shingle+md5 expression chain —
    // and pushes it below the repartition. Shingle arrays are never
    // empty (whole-text fallback), so outer semantics are identical.
    val exploded = df.select(col(idCol), explode_outer(col("__shh")).as("__h"))
    exploded
      .groupBy(col(idCol))
      .agg(
        min(pmod(col("__h") * lit(coeffs.head._1) + lit(coeffs.head._2), lit(P)))
          .as("__m0"),
        coeffs.zipWithIndex.tail.map { case ((a, b), i) =>
          min(pmod(col("__h") * lit(a) + lit(b), lit(P))).as(s"__m$i")
        }: _*
      )
      .select(
        col(idCol),
        array((0 until k).map(i => col(s"__m$i")): _*).as("__sig")
      )
  }

  /** Candidate near-duplicate pairs via MinHash LSH: distinct
    * (id_a, id_b), id_a < id_b, sharing at least one of `bands` bands.
    * One shuffle on (band, band_sig).
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      bands: Int = 8
  ): DataFrame =
    // single-pass bucket grouping: the fused sketch is computed once
    // and shuffled once (vs twice each for a bucket self-join)
    graft.ops.PairJoins.bucketedPairs(
      lshBandBuckets(df, idCol, textCol, k, bands),
      Seq("band", "band_sig"), idCol)

  /** The LSH band-bucket memberships [[lshCandidatePairs]] pairs on:
    * one row per (doc, band) with the band signature — also the input
    * to [[graft.ops.PairJoins.bucketAudit]]'s hot-bucket census
    * (pipe04).
    *
    * Fully fused per-row sketch (plans.MinHashBands): text → band
    * signatures in one generated pass, so candidate generation's ONLY
    * shuffle is the band-signature grouping downstream. The staged
    * explode → groupBy signature forms remain above for the parity
    * specs. posexplode_outer, deliberately: plain posexplode triggers
    * InferFiltersFromGenerate, whose injected size()>0 filter holds a
    * second copy of the sketch expression — outer semantics are
    * identical here (the bands array is never empty).
    */
  def lshBandBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 32,
      bands: Int = 8
  ): DataFrame =
    df.select(
      col(idCol),
      posexplode_outer(
        graft.plans.MinHashBands(df.sparkSession, col(textCol), k, bands)
      ).as(Seq("band", "band_sig"))
    )

  /** Exact word-shingle Jaccard between two shingle-array columns. */
  def jaccard(aSh: Column, bSh: Column): Column =
    size(array_intersect(aSh, bSh)).cast("double") /
      size(array_union(aSh, bSh))

  /** Stage: 32-bit SimHash ("__simhash") from per-token hashes; bit j
    * is set iff the (+1/-1) vote-sum over token-hash bit j is ≥ 0.
    * Requires stage 1 (tokens); materializes token hashes first.
    * (Interpreted HOF form — see [[simHashAgg]] for the codegen path.)
    */
  def withSimHash(df: DataFrame): DataFrame = {
    val withTokH =
      df.withColumn("__tokh", transform(col("__toks"), t => PortableHash.h32(t)))
    withTokH.withColumn(
      "__simhash",
      (0 until 32)
        .map { j =>
          val vote = aggregate(
            col("__tokh"),
            lit(0L),
            (s, h) =>
              s + when(shiftright(h, j).bitwiseAND(1L) === 1L, lit(1L))
                .otherwise(lit(-1L))
          )
          when(vote >= 0, lit(1L << j)).otherwise(lit(0L))
        }
        .reduce(_ + _)
    )
  }

  /** SimHash via explode + codegen'd sum aggregates: same values as
    * [[withSimHash]], Tungsten execution. Requires stage 1 (tokens);
    * returns (idCol, "__simhash"). Token multiplicity is preserved
    * (explode), matching the per-token vote semantics.
    */
  def simHashAgg(df: DataFrame, idCol: String): DataFrame = {
    val exploded = df
      // explode_outer: see minHashSignatureAgg (InferFiltersFromGenerate)
      .select(col(idCol), explode_outer(col("__toks")).as("__t"))
      .withColumn("__h", PortableHash.h32(col("__t")))
    val votes = exploded
      .groupBy(col(idCol))
      .agg(
        sum(
          when(shiftright(col("__h"), 0).bitwiseAND(1L) === 1L, lit(1L))
            .otherwise(lit(-1L))
        ).as("__v0"),
        (1 until 32).map { j =>
          sum(
            when(shiftright(col("__h"), j).bitwiseAND(1L) === 1L, lit(1L))
              .otherwise(lit(-1L))
          ).as(s"__v$j")
        }: _*
      )
    votes.select(
      col(idCol),
      (0 until 32)
        .map(j => when(col(s"__v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
        .as("__simhash")
    )
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
