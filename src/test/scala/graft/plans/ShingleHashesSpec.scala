package graft.plans

import graft.{SparkSpec, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  test("fused expression equals the staged HOF pipeline on fixtures") {
    val docs = Tables(spark, sfDir).documents.limit(200)
    val staged = Dedup
      .prepared(docs, "text")
      .select(col("doc_id"), sort_array(col("__shh")).as("h"))
    val fused = docs.select(
      col("doc_id"),
      sort_array(ShingleHashes(spark, col("text"))).as("h")
    )
    val diff = staged
      .join(fused.withColumnRenamed("h", "h2"), "doc_id")
      .filter(col("h") =!= col("h2"))
      .count()
    assert(diff === 0L)
    assert(staged.count() === 200L)
  }

  test("short-text fallback and golden hash") {
    val rows = Seq("one two", "  A  b ", "a b c d")
      .toDF("text")
      .select(ShingleHashes(spark, col("text")).as("h"))
      .collect()
      .map(_.getSeq[Long](0))
    // <3 tokens -> single hash of normalized whole text
    assert(rows(0).length === 1)
    assert(rows(0).head === graft.functions.PortableHash.h32Local("one two"))
    assert(rows(1).head === graft.functions.PortableHash.h32Local("a b"))
    // 4 tokens -> 2 shingles
    assert(rows(2).toSet === Set(
      graft.functions.PortableHash.h32Local("a b c"),
      graft.functions.PortableHash.h32Local("b c d")
    ))
  }
}
