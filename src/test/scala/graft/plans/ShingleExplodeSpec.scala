package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The Generator form must be row-for-row identical to exploding the
  * array expression — same normalization, <3-token fallback, hash.
  */
class ShingleExplodeSpec extends SparkSpec {

  test("generator ≡ explode(graft_shingle_hashes) on the fixture") {
    val docs = Tables(spark, sfDir).documents.limit(100)
    val viaArray = docs
      .select(col("doc_id"), explode(ShingleHashes(spark, col("text"))).as("h"))
    val viaGenerator = docs
      .select(col("doc_id"), ShingleExplode(spark, col("text")).as("h"))
    assert(viaArray.exceptAll(viaGenerator).isEmpty)
    assert(viaGenerator.exceptAll(viaArray).isEmpty)
    assert(viaGenerator.count() > 0)
  }

  test("short-text fallback and null behavior") {
    import spark.implicits._
    val d = Seq((1L, "one two"), (2L, null: String)).toDF("id", "t")
    val out = d
      .select(col("id"), ShingleExplode(spark, col("t")).as("h"))
      .collect()
    // <3 tokens -> one row (whole-text hash); null text -> no rows
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(
      out.head.getLong(1) ===
        graft.functions.PortableHash.h32Local("one two")
    )
  }

  test("LATERAL VIEW on the SQL surface") {
    ShingleExplode.register(spark)
    Tables(spark, sfDir).documents.limit(5).createOrReplaceTempView("se_docs")
    val n = spark
      .sql(
        s"""SELECT doc_id, h FROM se_docs
           |LATERAL VIEW ${ShingleExplode.FUNC_NAME}(text) t AS h""".stripMargin
      )
      .count()
    assert(n > 0)
  }
}
