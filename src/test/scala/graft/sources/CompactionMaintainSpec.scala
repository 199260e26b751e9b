package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The OPTIMIZE-cadence physical facts the cdc18 oracle cannot see:
  * append-mode churn grows the file population by exactly
  * batches × sources, and the maintenance pass collapses it to the
  * planned bins — pathology in, cure out.
  */
class CompactionMaintainSpec extends SparkSpec {

  private val docsPerFile = 8L
  private val target = 4000L

  private def parquetCount(path: String): Map[String, Int] = {
    val root = new java.io.File(path)
    root
      .listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .map(d =>
        d.getName -> d.listFiles().count(f =>
          f.isFile && f.getName.endsWith(".parquet")))
      .toMap
  }

  test("append churn grows files per source by one per batch; compaction collapses to bins") {
    val docs = graft.ops.Relational10.ingestFiles(spark, sfDir)
    Scratch.withTempDir("graft-cm1") { path =>
      Compaction.writeBinned(docs, path, "source", "file_id", dynamic = false)
      val base = parquetCount(path)
      val batches = 3
      (1 to batches).foreach { b =>
        graft.Tables(spark, sfDir).documents
          .filter(pmod(col("doc_id"), lit(7)) === b)
          .select(
            (col("doc_id") + lit(1000000L * b)).as("doc_id"),
            col("source"),
            col("n_chars"),
            lit(1000000L + b).as("file_id")
          )
          .repartition(col("source"))
          .write
          .partitionBy("source")
          .mode("append")
          .parquet(path)
      }
      val churned = parquetCount(path)
      churned.foreach { case (src, n) =>
        assert(n === base(src) + batches,
          s"$src: expected ${base(src)} + $batches files after churn, got $n")
      }
      val files = PartitionedStore
        .read(spark, path)
        .groupBy(col("source"), col("file_id"))
        .agg(sum(col("n_chars")).as("bytes"))
      val plan = Compaction
        .plan(files, "source", "file_id", "bytes", target)
        .select(col("source"), col("file_id"), col("bin"))
      val bins = plan
        .groupBy(col("source"))
        .agg(countDistinct(col("bin")).as("n_bins"))
        .collect()
        .map(r => s"source=${r.getString(0)}" -> r.getAs[Long]("n_bins"))
        .toMap
      val rowsBefore = PartitionedStore.read(spark, path).count()
      Compaction.execute(spark, path, "source", Seq("file_id"), plan)
      val compacted = parquetCount(path)
      compacted.foreach { case (src, n) =>
        assert(n.toLong === bins(src), s"$src: ${n} files vs ${bins(src)} bins")
        assert(n < churned(src), s"$src: compaction did not shrink the population")
      }
      assert(PartitionedStore.read(spark, path).count() === rowsBefore,
        "maintenance changed the row population")
    }
  }
}
