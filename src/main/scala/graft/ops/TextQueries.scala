package graft.ops

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over `documents`, each with a DuckDB oracle
  * mirroring the expression tree exactly (same tokenization, same
  * double-arithmetic order).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  // -- DuckDB mirror fragments (lockstep with graft.functions.TextFunctions;
  //    normalization is the single shared constant) --
  private val toksSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val normSql = TextQueriesSqlFragments.normSql
  private def stopSql(words: Seq[String]) =
    s"len(list_filter($toksSql, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
  private val punctSql =
    """len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g'))"""
  private val cjkSql =
    "len(text) - len(regexp_replace(text, '[一-鿿]', '', 'g'))"

  private val tokenStats: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        uniqueTokenCount(col("text")).as("n_uniq"),
        tokenCharCount(col("text")).as("n_tok_chars"),
        avgTokenLen(col("text")).as("avg_tok_len"),
        typeTokenRatio(col("text")).as("ttr")
      )
      .orderBy("doc_id")

  private val quality: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        punctCount(col("text")).as("n_punct"),
        stopwordCount(col("text"), stopwords("en")).as("n_stop"),
        qualityScore(col("text")).as("quality")
      )
      .orderBy("doc_id")

  private val langid: Q = (s, dir) =>
    Tables(s, dir).documents
      .groupBy(col("lang"), langId(col("text")).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  private val fingerprint: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        fingerprintMd5(col("text")).as("fp_md5"),
        // fused codegen form of fingerprintRolling (value-identical;
        // see graft.plans.RollingFingerprint)
        graft.plans.RollingFingerprint(s, col("text")).as("fp_roll")
      )
      .orderBy("doc_id")

  /** Corpus token frequency via explode (the Generate operator): the
    * canonical build-a-vocabulary pass. Map-side expansion, hash
    * aggregate on the token, top-50 with a lexical tiebreak.
    *
    * Scale note: `orderBy().limit(k)` here is NOT a global sort —
    * Catalyst plans it as TakeOrderedAndProject (per-partition top-k
    * heaps, merged on the driver over n_partitions·k rows), so the
    * top-50 costs one hash-agg shuffle plus an O(k) merge at any
    * corpus size (asserted in TextQueriesPlanSpec). The aggregate's
    * key space (the vocabulary) grows sublinearly with the corpus;
    * if even that shuffle must shrink, compose a count-min sketch
    * before the exact pass — not needed at this key cardinality.
    */
  private val topTokens: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(50)

  /** BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    * (letter runs | single digits | single punctuation) against the
    * whitespace count — the standard cheap estimate of model-token
    * cost per document.
    */
  private val bpeRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  private val bpeCount: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpeRegex), lit(0)))
          .as("n_bpe"),
        tokenCount(col("text")).as("n_ws"),
        (size(regexp_extract_all(col("text"), lit(bpeRegex), lit(0)))
          .cast("double") / tokenCount(col("text"))).as("bpe_per_ws")
      )
      .orderBy("doc_id")

  /** PII/boilerplate scrub — the redaction pass every training-data
    * pipeline runs before tokenization: URLs then emails replaced
    * with sentinel tags (URL first, so an email-looking userinfo in a
    * URL is consumed as part of the URL), plus per-doc match counts
    * for the redaction report. Regexes stay in the RE2 ∩ java.util
    * .regex common subset so both engines match identically; map-side
    * only, no shuffle.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val urlRe = "https?://[^\\s]+"
  private val piiScrub: Q = (s, dir) =>
    Tables(s, dir).documents
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("text"), lit(urlRe), lit(0))).as("n_url"),
        regexp_replace(
          regexp_replace(col("text"), urlRe, "<URL>"),
          emailRe,
          "<EMAIL>"
        ).as("scrubbed")
      )
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "text01_token_stats" -> tokenStats,
    "text02_quality" -> quality,
    "text03_langid" -> langid,
    "text04_fingerprint" -> fingerprint,
    "text05_top_tokens" -> topTokens,
    "text06_bpe_count" -> bpeCount,
    "text07_pii_scrub" -> piiScrub
  )

  private val langCaseSql: String = {
    val en = stopSql(stopwords("en"))
    val fr = stopSql(stopwords("fr"))
    val de = stopSql(stopwords("de"))
    val es = stopSql(stopwords("es"))
    s"""CASE WHEN $cjkSql > 0 THEN 'zh'
       | WHEN $en >= $fr AND $en >= $de AND $en >= $es AND $en > 0 THEN 'en'
       | WHEN $fr >= $de AND $fr >= $es AND $fr > 0 THEN 'fr'
       | WHEN $de >= $es AND $de > 0 THEN 'de'
       | WHEN $es > 0 THEN 'es'
       | ELSE 'unknown' END""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "text01_token_stats" ->
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  len(list_distinct($toksSql)) AS n_uniq,
         |  CAST(COALESCE(list_aggregate(list_transform($toksSql, t -> len(t)), 'sum'), 0) AS BIGINT) AS n_tok_chars,
         |  CAST(COALESCE(list_aggregate(list_transform($toksSql, t -> len(t)), 'sum'), 0) AS DOUBLE)
         |    / len($toksSql) AS avg_tok_len,
         |  CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) AS ttr
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text02_quality" ->
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  $punctSql AS n_punct,
         |  ${stopSql(stopwords("en"))} AS n_stop,
         |  0.4 * least(1.0, CAST(len($toksSql) AS DOUBLE) / 50.0)
         |  + 0.3 * least(1.0, (CAST(${stopSql(stopwords("en"))} AS DOUBLE)
         |      / len($toksSql)) * 5.0)
         |  + 0.3 * (CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql))
         |    AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text03_langid" ->
      s"""SELECT lang, $langCaseSql AS pred_lang, COUNT(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    "text06_bpe_count" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT)
         |    AS n_bpe,
         |  len($toksSql) AS n_ws,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / len($toksSql) AS bpe_per_ws
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text05_top_tokens" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents)
         |SELECT token, COUNT(*) AS n FROM toks
         |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,
    "text04_fingerprint" ->
      s"""SELECT doc_id,
         |  md5($normSql) AS fp_md5,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split($normSql, ''),
         |                     ch -> CAST(unicode(ch) AS BIGINT))),
         |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin,
    // DuckDB regexp_replace is first-match-only without the 'g' flag
    "text07_pii_scrub" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$emailRe')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$urlRe')) AS INT) AS n_url,
         |  regexp_replace(regexp_replace(text, '$urlRe', '<URL>', 'g'),
         |                 '$emailRe', '<EMAIL>', 'g') AS scrubbed
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
