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

  val queries: Map[String, Q] = Map(
    "dedup21_substring_spans" -> substringSpans
  )

  private val normSql = TextQueriesSqlFragments.normSql

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
         |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
