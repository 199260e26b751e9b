package graft.plans

import graft.{SparkSpec, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class TextSketchesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32
  private val BANDS = 8

  test("fused MinHashBands equals the staged signature+band pipeline") {
    val docs = Tables(spark, sfDir).documents.limit(200)
    val withHashes = docs.withColumn(
      "__shh",
      ShingleHashes(spark, col("text"))
    )
    val sig = Dedup.minHashSignatureAgg(withHashes, "doc_id", K)
    val rows = K / BANDS
    val staged = sig.select(
      col("doc_id"),
      array(
        (0 until BANDS).map(b => Dedup.bandSignature(col("__sig"), b, rows)): _*
      ).as("bands")
    )
    val fused = docs.select(
      col("doc_id"),
      MinHashBands(spark, col("text"), K, BANDS).as("bands2")
    )
    val diff = staged
      .join(fused, "doc_id")
      .filter(col("bands") =!= col("bands2"))
      .count()
    assert(diff === 0L)
    assert(fused.count() === 200L)
  }

  test("fused SimHash32 equals the staged vote aggregation") {
    val docs = Tables(spark, sfDir).documents.limit(200)
    val staged = Dedup.simHashAgg(Dedup.withTokens(docs, "text"), "doc_id")
    val fused = docs.select(
      col("doc_id"),
      SimHash32(spark, col("text")).as("__sim2")
    )
    val diff = staged
      .join(fused, "doc_id")
      .filter(col("__simhash") =!= col("__sim2"))
      .count()
    assert(diff === 0L)
  }

  test("simhash golden bits on a tiny doc") {
    val got = Seq("a a b").toDF("text")
      .select(SimHash32(spark, col("text")).as("h"))
      .head().getLong(0)
    // manual vote: tokens a,a,b -> per-bit majority of their h32 bits
    val ha = graft.functions.PortableHash.h32Local("a")
    val hb = graft.functions.PortableHash.h32Local("b")
    val expected = (0 until 32).map { j =>
      val vote =
        (if (((ha >> j) & 1L) == 1L) 2 else -2) +
          (if (((hb >> j) & 1L) == 1L) 1 else -1)
      if (vote >= 0) 1L << j else 0L
    }.sum
    assert(got === expected)
  }

  test("simhash64 low word IS simhash32; high word votes the seed-1 hash") {
    // bits [0,32) of the 64-bit sketch use the SAME token hash and
    // vote rule as SimHash32 — the invariant that makes dedup24 the
    // strict widening of dedup07
    val rows = graft
      .Tables(spark, sfDir)
      .documents
      .limit(50)
      .select(
        SimHash64(spark, col("text")).as("h64"),
        SimHash32(spark, col("text")).as("h32")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(0) & 0xffffffffL) === (r.getLong(1) & 0xffffffffL))
    }
    // high word: manual vote on the seed-1 hashes of a tiny doc
    val got = Seq("a a b").toDF("text")
      .select(SimHash64(spark, col("text")).as("h"))
      .head().getLong(0)
    val ha = graft.functions.PortableHash.h32Local("1:a")
    val hb = graft.functions.PortableHash.h32Local("1:b")
    val expectedHi = (0 until 32).map { j =>
      val vote =
        (if (((ha >> j) & 1L) == 1L) 2 else -2) +
          (if (((hb >> j) & 1L) == 1L) 1 else -1)
      if (vote >= 0) 1L << (32 + j) else 0L
    }.sum
    assert((got & 0xffffffff00000000L) === expectedHi)
  }
}
