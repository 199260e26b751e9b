package graft.sources

import graft.{SparkSpec, Tables}
import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partition-granular upsert contract: a dynamic-overwrite batch
  * rewrites only its own partitions (other partitions' files are
  * bit-identical on disk), the merged read-back equals old ∪ new, and
  * partition filters prune at the directory level.
  */
class PartitionedStoreSpec extends SparkSpec {

  private def fileState(root: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(root))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified())
      .toMap
  }

  test("dynamic overwrite touches only the batch's partitions") {
    val dir = Files.createTempDirectory("graft-store").toString
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"), col("source"))
    PartitionedStore.write(docs, dir, Seq("source"))
    val before = fileState(dir)
    val sources = docs.select("source").distinct().collect().map(_.getString(0)).sorted
    assert(sources.length > 1, sources.toSeq)
    val target = sources.head

    // upsert batch: rewrite one source's rows with bumped n_chars
    val batch = docs
      .filter(col("source") === target)
      .withColumn("n_chars", col("n_chars") + 1000000L)
    PartitionedStore.overwritePartitions(batch, dir, Seq("source"))
    val after = fileState(dir)

    val untouchedBefore = before.filter(!_._1.contains(s"source=$target"))
    val untouchedAfter = after.filter(!_._1.contains(s"source=$target"))
    assert(untouchedAfter === untouchedBefore) // same files, same mtimes

    val merged = PartitionedStore.read(spark, dir)
    assert(merged.filter(col("source") === target && col("n_chars") < 1000000L).count() === 0L)
    assert(
      merged.count() === docs.count(),
      "merge must preserve untouched partitions and replace the target"
    )
    val others = merged.filter(col("source") =!= target)
    val expectOthers = docs.filter(col("source") =!= target)
    assert(others.exceptAll(expectOthers).count() === 0L)
    assert(expectOthers.exceptAll(others).count() === 0L)
  }

  test("reads prune partitions from the directory layout") {
    val dir = Files.createTempDirectory("graft-store2").toString
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"))
    PartitionedStore.write(docs, dir, Seq("source"))
    val some = docs.select("source").distinct().limit(1).collect()(0).getString(0)
    val pruned = PartitionedStore.read(spark, dir).filter(col("source") === some)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains(s"isnotnull(source") || scan.contains("source#"), scan)
    assert(pruned.count() === docs.filter(col("source") === some).count())
  }
}
