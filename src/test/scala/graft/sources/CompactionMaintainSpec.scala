package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The OPTIMIZE-cadence physical facts the cdc18 oracle cannot see:
  * append-mode churn grows the file population by exactly
  * batches × sources (each append commit adds one file per source to
  * the manifest), and the maintenance pass collapses it to the
  * planned bins — pathology in, cure out.
  */
class CompactionMaintainSpec extends SparkSpec {

  private val target = 4000L

  private def parquetCount(path: String): Map[String, Int] =
    ManifestStore
      .snapshot(spark, path)
      .state(ManifestStore.MAIN)
      .partitions
      .values
      .map(p => p.values.head -> p.files.length)
      .toMap

  test("append churn grows files per source by one per batch; compaction collapses to bins") {
    val docs = graft.ops.Relational10.ingestFiles(spark, sfDir)
    Scratch.withTempDir("graft-cm1") { path =>
      Compaction.writeBinned(docs, path, "source", "file_id", dynamic = false)
      val base = parquetCount(path)
      val batches = 3
      (1 to batches).foreach { b =>
        val batch = graft.Tables(spark, sfDir).documents
          .filter(pmod(col("doc_id"), lit(7)) === b)
          .select(
            (col("doc_id") + lit(1000000L * b)).as("doc_id"),
            col("source"),
            col("n_chars"),
            lit(1000000L + b).as("file_id")
          )
          .withColumn("bin", col("file_id"))
        ManifestStore.append(batch, path, Seq("source"))
      }
      val churned = parquetCount(path)
      churned.foreach { case (src, n) =>
        assert(n === base(src) + batches,
          s"$src: expected ${base(src)} + $batches files after churn, got $n")
      }
      val files = ManifestStore
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
        .map(r => r.getString(0) -> r.getAs[Long]("n_bins"))
        .toMap
      val rowsBefore = ManifestStore.read(spark, path).count()
      Compaction.execute(spark, path, "source", Seq("file_id"), plan)
      val compacted = parquetCount(path)
      compacted.foreach { case (src, n) =>
        assert(n.toLong === bins(src), s"$src: ${n} files vs ${bins(src)} bins")
        assert(n < churned(src), s"$src: compaction did not shrink the population")
      }
      assert(ManifestStore.read(spark, path).count() === rowsBefore,
        "maintenance changed the row population")
      // the manifest's file census agrees with the data-level census —
      // q86's production input (manifest stats) is trustworthy
      val manifestRows = ManifestStore.snapshot(spark, path)
        .partitionStats().map { case (src, _, rows, _) => src -> rows }.toMap
      val dataRows = ManifestStore.read(spark, path)
        .groupBy(col("source")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(manifestRows === dataRows)
    }
  }
}
