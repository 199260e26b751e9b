package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("portable hash: Spark expression equals plan-time Scala value") {
    val inputs = Seq("hello", "a:0", "b:31", "the quick brown fox", "")
    val got = inputs
      .toDF("s")
      .select(PortableHash.h32(col("s")).as("h"))
      .collect()
      .map(_.getLong(0))
    val expected = inputs.map(PortableHash.h32Local)
    assert(got.toSeq === expected)
  }

  test("token stats golden values") {
    val row = Seq("  the cat  sat on the mat  ")
      .toDF("text")
      .select(
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.uniqueTokenCount(col("text")).as("u"),
        TextFunctions.tokenCharCount(col("text")).as("c"),
        TextFunctions.normalized(col("text")).as("norm")
      )
      .head()
    assert(row.getInt(0) === 6)
    assert(row.getInt(1) === 5) // "the" twice
    assert(row.getLong(2) === 17L) // thecatsatonthemat
    assert(row.getString(3) === "the cat sat on the mat")
  }

  test("langId picks profiles deterministically") {
    val rows = Seq(
      "the cat and the dog of a house",
      "le chat et la maison des gens",
      "der hund und die katze das haus",
      "el gato y los perros que corren",
      "你好 世界",
      "zzz qqq xxx"
    ).toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
      .collect()
      .map(_.getString(0))
    assert(rows.toSeq === Seq("en", "fr", "de", "es", "zh", "unknown"))
  }

  test("shingles and jaccard golden values") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),
      (3L, "a b c x")
    ).toDF("doc_id", "text")
    val sh = Dedup.withShingles(Dedup.withTokens(df, "text"))
    val arr = sh
      .orderBy("doc_id")
      .select(col("__sh"))
      .collect()
      .map(_.getSeq[String](0))
    assert(arr(0).toSet === Set("a b c", "b c d"))
    // identical docs -> jaccard 1; one shingle shared of three -> 1/3
    val pairs = sh
      .select(col("doc_id").as("id_a"), col("__sh").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("__sh").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(math.abs(pairs((1L, 3L)) - 1.0 / 3.0) < 1e-12)
  }

  test("minhash agg signature equals per-row HOF signature") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")
    ).toDF("doc_id", "text")
    val prep = Dedup.prepared(df, "text")
    val viaAgg = Dedup
      .minHashSignatureAgg(prep, "doc_id", 8)
      .orderBy("doc_id")
      .select("__sig")
      .collect()
      .map(_.getSeq[Long](0))
    val viaRow = Dedup
      .withMinHashSignature(prep, 8)
      .orderBy("doc_id")
      .select("__sig")
      .collect()
      .map(_.getSeq[Long](0))
    assert(viaAgg.toSeq.map(_.toSeq) === viaRow.toSeq.map(_.toSeq))
  }

  test("simhash: identical docs collide, hamming small for near-dups") {
    val df = Seq(
      (1L, "spark makes big data simple and fast"),
      (2L, "spark makes big data simple and fast"),
      (3L, "spark makes big data simple and quick"),
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val sh = Dedup
      .simHashAgg(Dedup.withTokens(df, "text"), "doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(sh(1L) === sh(2L))
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(near < far)
  }

  test("rolling fingerprint golden value") {
    // "ab" -> ((0*31+97)%M)*31+98 % M = 97*31+98 = 3105
    val got = Seq("ab")
      .toDF("text")
      .select(TextFunctions.fingerprintRolling(col("text")))
      .head()
      .getLong(0)
    assert(got === 3105L)
  }
}
