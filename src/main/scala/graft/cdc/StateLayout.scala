package graft.cdc

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of materialized state (SURVEY.md §4.2: "physical
  * concerns we own" — key-bucketed state, compaction cadence).
  *
  * State is stored as a bucketed table hashed on the key: serving
  * point-lookups touch one bucket, and joins/merges against another
  * table bucketed the same way need NO shuffle on either side (the
  * planner sees compatible `HashPartitioning`). At 100 TB this is the
  * difference between a merge that moves 100 TB and one that moves
  * the delta.
  */
object StateLayout {

  /** Write `df` as a bucketed+sorted table (hash(key) → bucket,
    * sorted by key within each bucket for merge-friendly scans).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCol: String,
      buckets: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Compaction: rewrite the table (micro-batch upserts accrete small
    * files; compaction restores scan efficiency without changing
    * bucketing). The swap renames the live table ASIDE first, so a
    * crash mid-swap leaves a recoverable `<table>__old` rather than no
    * table at all; the backup is dropped only after the new table is
    * serving under the live name.
    */
  def compact(
      spark: SparkSession,
      table: String,
      keyCol: String,
      buckets: Int
  ): Unit = {
    val tmp = table + "__compact"
    val old = table + "__old"
    spark.table(table).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"DROP TABLE $old")
  }

  /** Bucket-pruned point lookup (one bucket's files scanned). */
  def lookup(spark: SparkSession, table: String, keyCol: String, key: Long): DataFrame =
    spark.table(table).filter(col(keyCol) === key)
}
