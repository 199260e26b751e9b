package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-trips a fixture-derived frame through each interchange
  * format, checks the quarantine path for malformed rows, and
  * plan-asserts that the columnar path (ORC) keeps parquet-grade
  * pushdown + column pruning.
  */
class FileFormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private lazy val docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select("doc_id", "lang", "source", "n_chars")
      .collect()
      .map(_.toString)
      .sorted
      .toSeq

  test("csv round-trips with an explicit schema") {
    val dir = tmp("csv")
    FileFormats.writeCsv(docs, dir)
    val back = FileFormats.readCsv(spark, dir, schema)
    assert(sortedRows(back) === sortedRows(docs))
  }

  test("json lines round-trips with an explicit schema") {
    val dir = tmp("json")
    FileFormats.writeJsonLines(docs, dir)
    val back = FileFormats.readJsonLines(spark, dir, schema)
    assert(sortedRows(back) === sortedRows(docs))
  }

  test("malformed rows are quarantined into _corrupt_record, not dropped") {
    val dir = tmp("badjson")
    val good = """{"doc_id": 1, "lang": "en", "source": "web", "n_chars": 10}"""
    val bad = """{"doc_id": oops not json"""
    import spark.implicits._
    spark
      .createDataset(Seq(good, bad))
      .repartition(1)
      .write
      .mode("overwrite")
      .text(dir)
    val back = FileFormats.readJsonLines(spark, dir, schema).cache()
    try {
      assert(back.count() === 2L)
      val quarantined =
        back.filter(col(FileFormats.CorruptColumn).isNotNull).collect()
      assert(quarantined.length === 1)
      assert(quarantined.head.getAs[String](FileFormats.CorruptColumn).contains("oops"))
      assert(back.filter(col("doc_id") === 1L).count() === 1L)
    } finally back.unpersist()
  }

  test("orc round-trips and keeps pushdown + column pruning") {
    val dir = tmp("orc")
    FileFormats.writeOrc(docs, dir)
    val back = FileFormats.readOrc(spark, dir, schema)
    assert(sortedRows(back) === sortedRows(docs))
    val pruned = back.filter(col("doc_id") === 42L).select("lang")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters"), scan)
    assert(
      scan.contains("EqualTo(doc_id,42)") || scan.contains("IsNotNull(doc_id)"),
      scan
    )
    // ReadSchema must carry only the filter + projection columns
    assert(!scan.contains("n_chars") || !scan.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars"), scan)
    assert(pruned.collect().map(_.getString(0)).toSeq.nonEmpty)
  }

  test("csv scan parses only requested columns (column pruning at the parser)") {
    val dir = tmp("csvprune")
    FileFormats.writeCsv(docs, dir)
    val back = FileFormats.readCsv(spark, dir, schema).select("doc_id")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema"), scan)
    assert(scan.contains("struct<doc_id:bigint>"), scan)
    assert(back.count() === docs.count())
  }
}
