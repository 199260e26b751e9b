package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline
  * surface: tokenization, quality scoring, language ID, document
  * fingerprinting. All pure per-row expressions (no UDFs, no shuffle)
  * so they stay inside whole-stage codegen / evaluate vectorized —
  * the 100 TB posture is "text ops are map-side only".
  *
  * Every function has a DuckDB-SQL mirror used by the oracle gate
  * (see graft.ops.TextQueries) — keep the two in lockstep.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Total characters across tokens (exact integer aggregate). BIGINT
    * on both engines: DuckDB's list_aggregate 'sum' yields HUGEINT,
    * which pandas renders as float64 — both sides pin to long so the
    * gate hashes `13`, not `13.0` (see oracle text01).
    */
  def tokenCharCount(text: Column): Column =
    aggregate(
      transform(tokens(text), t => length(t)),
      lit(0),
      (acc, x) => acc + x
    ).cast("long")

  /** Mean token length as double (exact int sum / count). */
  def avgTokenLen(text: Column): Column =
    tokenCharCount(text).cast("double") / tokenCount(text)

  /** Type-token ratio: unique / total tokens. */
  def typeTokenRatio(text: Column): Column =
    uniqueTokenCount(text).cast("double") / tokenCount(text)

  /** Count of tokens found in `words`. */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*)))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Language-ID stopword profiles (public function-word lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "que", "una")
  )

  /** Heuristic language ID: CJK-character presence short-circuits to
    * zh; otherwise the stopword profile with the most hits wins
    * (deterministic tie order en > fr > de > es); no hits ⇒ unknown.
    */
  def langId(text: Column): Column = {
    val cjk = length(text) - length(regexp_replace(text, "[一-鿿]", ""))
    val s = stopwords.map { case (l, w) => l -> stopwordCount(text, w) }
    when(cjk > 0, lit("zh"))
      .when(
        s("en") >= s("fr") && s("en") >= s("de") && s("en") >= s("es") && s("en") > 0,
        lit("en")
      )
      .when(s("fr") >= s("de") && s("fr") >= s("es") && s("fr") > 0, lit("fr"))
      .when(s("de") >= s("es") && s("de") > 0, lit("de"))
      .when(s("es") > 0, lit("es"))
      .otherwise(lit("unknown"))
  }

  /** Composite quality score in [0,1]: length saturation, stopword
    * density, lexical diversity. Deterministic double arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio =
      stopwordCount(text, stopwords("en")).cast("double") / nTok
    val lengthTerm = least(lit(1.0), nTok / 50.0)
    val diversity = typeTokenRatio(text)
    lit(0.4) * lengthTerm + lit(0.3) * least(lit(1.0), stopRatio * 5.0) +
      lit(0.3) * diversity
  }

  /** Whitespace-normalized lowercase form (dedup canonicalization). */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized form. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** 31-base rolling polynomial hash mod 1e9+7 over the normalized
    * text's codepoints — the classic Karp-Rabin document fingerprint,
    * expressed with higher-order array functions (portable to the
    * DuckDB oracle via list_reduce).
    */
  def fingerprintRolling(text: Column): Column = {
    val cps = transform(
      array_remove(split(normalized(text), ""), ""),
      ch => ascii(ch).cast("long")
    )
    aggregate(
      cps,
      lit(0L),
      (acc, x) => pmod(acc * 31L + x, lit(1000000007L))
    )
  }
}
