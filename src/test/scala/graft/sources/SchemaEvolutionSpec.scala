package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Additive schema evolution on the parquet store: a corpus that
  * gains a column mid-life (a new quality score, a new provenance
  * tag) must keep its old files readable — `mergeSchema` unions the
  * footers and null-fills history — while readers pinned to the OLD
  * schema keep working against new files (projection is by name).
  * This is the evolution contract a long-lived 100 TB store needs so
  * that adding a signal never forces a table rewrite.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("added column merges across file generations; old readers unaffected") {
    val dir = Files.createTempDirectory("graft-evo").toString
    // generation 1: (doc_id, lang)
    Seq((1L, "en"), (2L, "fr"))
      .toDF("doc_id", "lang")
      .write
      .mode("overwrite")
      .parquet(dir)
    // generation 2 (append): adds quality
    Seq((3L, "de", 0.9), (4L, "en", 0.4))
      .toDF("doc_id", "lang", "quality")
      .write
      .mode("append")
      .parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "lang", "quality"))
    assert(merged.count() === 4L)
    // history is null-filled, new rows carry the value
    assert(merged.filter(col("doc_id") <= 2L && col("quality").isNotNull).count() === 0L)
    assert(merged.filter(col("doc_id") >= 3L && col("quality").isNull).count() === 0L)

    // an old reader projecting the v1 schema still reads everything
    val oldReader = spark.read
      .schema("doc_id BIGINT, lang STRING")
      .parquet(dir)
    assert(oldReader.count() === 4L)
    assert(
      oldReader.select("doc_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L)
    )
  }
}
