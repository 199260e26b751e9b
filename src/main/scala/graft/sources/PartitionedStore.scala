package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-layout partitioned parquet store with partition-granular
  * upsert — the storage shape of a continuously-rebuilt corpus
  * (partition by source / crawl date / shard, re-materialize only the
  * partitions a batch touches).
  *
  * The upsert is `partitionOverwriteMode=dynamic`: an `overwrite`
  * write replaces ONLY the partitions present in the incoming frame
  * and leaves every other partition's files untouched on disk. That
  * makes the per-batch cost O(touched partitions), not O(store) — a
  * parquet-native MERGE at partition granularity, the same posture as
  * StreamMinhashDedup's segment log (a table format like Delta/Iceberg
  * refines it to file granularity with the identical interface:
  * replace-where).
  *
  * Static overwrite (the default) would truncate the whole table
  * first — the classic footgun this module exists to scope away; the
  * mode is pinned per-WRITE (an option, not a session conf) so a
  * concurrent static caller elsewhere is unaffected.
  *
  * Reads prune partitions from the directory layout: a filter on the
  * partition column never lists — let alone reads — the other
  * partitions (`PartitionFilters` in the scan).
  */
object PartitionedStore {

  /** Cluster rows by the partition columns before a partitioned
    * write: without it every upstream task writes one file into every
    * partition directory it touches — up to (tasks × partitions)
    * small files per write, the exact pathology q86's compaction
    * planner exists to diagnose. One hash shuffle on the partition
    * key bounds it at ~1 file per directory per shuffle partition
    * holding that key. (A size-aware writer — maxRecordsPerFile /
    * a table format's OPTIMIZE — refines this for skewed partitions.)
    */
  private def clustered(df: DataFrame, partitionCols: Seq[String]): DataFrame =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    clustered(df, partitionCols).write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Replace exactly the partitions present in `batch`; all other
    * partitions keep their existing files byte-for-byte. */
  def overwritePartitions(
      batch: DataFrame,
      path: String,
      partitionCols: Seq[String]
  ): Unit =
    clustered(batch, partitionCols).write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
