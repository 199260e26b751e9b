package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the physical facts of the executed compaction that the q109
  * oracle cannot see: one parquet file per planned bin, partitions
  * absent from the plan byte-identical on disk, and the
  * refuse-partial-plan guard firing BEFORE any write.
  */
class CompactionExecuteSpec extends SparkSpec {

  private val target = 4000L
  private val docsPerFile = 8L

  private def plantedDocs =
    graft.ops.Relational10.ingestFiles(spark, sfDir)

  /** Parquet data files under each source= directory: name → bytes. */
  private def listParquet(path: String): Map[String, Map[String, Long]] = {
    val root = new java.io.File(path)
    root
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .map { d =>
        d.getName -> d
          .listFiles()
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.length())
          .toMap
      }
      .toMap
  }

  private def md5s(path: String, dir: String): Map[String, String] = {
    val d = new java.io.File(path, dir)
    d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> java.security.MessageDigest
          .getInstance("MD5")
          .digest(bytes)
          .map(b => f"$b%02x")
          .mkString
      }
      .toMap
  }

  private def binPlanFor(path: String) = {
    val files = PartitionedStore
      .read(spark, path)
      .groupBy(col("source"), col("file_id"))
      .agg(sum(col("n_chars")).as("bytes"))
    Compaction
      .plan(files, "source", "file_id", "bytes", target)
      .select(col("source"), col("file_id"), col("bin"))
  }

  test("execution lands exactly one physical file per planned bin") {
    Scratch.withTempDir("graft-cx1") { path =>
      Compaction.writeBinned(plantedDocs, path, "source", "file_id",
        dynamic = false)
      val before = listParquet(path)
      val plan = binPlanFor(path)
      val expectedBins = plan
        .groupBy(col("source"))
        .agg(countDistinct(col("bin")).as("n_bins"))
        .collect()
        .map(r => s"source=${r.getString(0)}" -> r.getAs[Long]("n_bins"))
        .toMap
      val expectedFilesBefore = plan
        .groupBy(col("source"))
        .agg(countDistinct(col("file_id")).as("n_files"))
        .collect()
        .map(r => s"source=${r.getString(0)}" -> r.getAs[Long]("n_files"))
        .toMap
      // the plant really is one physical file per simulated ingest file
      before.foreach { case (src, fs) =>
        assert(fs.size.toLong === expectedFilesBefore(src), src)
      }
      Compaction.execute(spark, path, "source", Seq("file_id"), plan)
      val after = listParquet(path)
      assert(after.keySet === before.keySet)
      after.foreach { case (src, fs) =>
        assert(fs.size.toLong === expectedBins(src),
          s"$src has ${fs.size} files, planned ${expectedBins(src)} bins")
      }
      // compaction actually shrank the file population somewhere
      assert(after.values.map(_.size).sum < before.values.map(_.size).sum)
    }
  }

  test("partitions absent from the plan stay byte-identical on disk") {
    Scratch.withTempDir("graft-cx2") { path =>
      Compaction.writeBinned(plantedDocs, path, "source", "file_id",
        dynamic = false)
      val sources = PartitionedStore
        .read(spark, path)
        .select(col("source"))
        .distinct()
        .collect()
        .map(_.getString(0))
        .sorted
      val excluded = sources.head
      val beforeFp = md5s(path, s"source=$excluded")
      val idsBefore = PartitionedStore
        .read(spark, path)
        .select(col("doc_id"))
        .collect()
        .map(_.getLong(0))
        .sorted
        .toSeq
      val plan = binPlanFor(path).filter(col("source") =!= excluded)
      Compaction.execute(spark, path, "source", Seq("file_id"), plan)
      val afterFp = md5s(path, s"source=$excluded")
      assert(afterFp === beforeFp,
        "untouched partition's files changed (names or bytes)")
      val idsAfter = PartitionedStore
        .read(spark, path)
        .select(col("doc_id"))
        .collect()
        .map(_.getLong(0))
        .sorted
        .toSeq
      assert(idsAfter === idsBefore, "row identity broke across the rewrite")
    }
  }

  test("a plan missing a file of a touched partition is refused before writing") {
    Scratch.withTempDir("graft-cx3") { path =>
      Compaction.writeBinned(plantedDocs, path, "source", "file_id",
        dynamic = false)
      val fullPlan = binPlanFor(path).localCheckpoint(true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("file_id"))
      // drop ONE file from one source's plan — the classic partial plan
      val partial = fullPlan
        .withColumn("rn", row_number().over(w))
        .filter(!(col("rn") === 1 && col("source") === fullPlan
          .select(min(col("source"))).head().getString(0)))
        .drop("rn")
      val beforeFp = listParquet(path)
      val e = intercept[IllegalArgumentException] {
        Compaction.execute(spark, path, "source", Seq("file_id"), partial)
      }
      assert(e.getMessage.contains("does not cover"))
      assert(listParquet(path) === beforeFp, "refused rewrite still wrote")
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(fullPlan)
    }
  }
}
