package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink surface (reference: the Cloud SQL Postgres the
  * demo app reads/writes via its connection properties —
  * hello_cloud_run/src/main/resources/application-cloud-sql.properties:8-10).
  * Spark's built-in JDBC relation already provides everything the
  * reference's data access needs — this wrapper only pins the options
  * that matter at scale and gives the repo a tested entry point
  * (JdbcSourceSpec runs it against an embedded Derby database, the
  * JDBC engine on Spark's own classpath).
  *
  * Scale posture:
  *   - An unpartitioned JDBC read is ONE task pulling the whole table
  *     through one connection — correct only for small dims. Always
  *     pass `partitioning` for facts: Spark issues `numPartitions`
  *     range-predicated queries in parallel, and each executor reads
  *     its slice (the JDBC analogue of file splits).
  *   - Catalyst pushes filters and column pruning into the remote SQL
  *     (`PushedFilters` on the scan node — asserted in the spec), so
  *     selective queries don't ship the table.
  *   - `fetchsize` keeps the driver-side row buffer bounded; the
  *     default (10) throttles Postgres badly, 1000+ is the norm.
  *   - Writes are per-partition batched INSERTs (`batchsize`); for
  *     CDC-style upserts, stage to a temp table and MERGE — the
  *     cdc.Materializer output is the frame you'd stage.
  */
object JdbcSource {

  /** (column, lowerBound, upperBound, numPartitions) for parallel
    * range-partitioned reads. Bounds only STRIPE the table; rows
    * outside still arrive in the edge partitions.
    */
  final case class Partitioning(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int
  )

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      partitioning: Option[Partitioning] = None,
      fetchSize: Int = 1000,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize)
    val parted = partitioning.fold(base) { p =>
      base
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound)
        .option("upperBound", p.upperBound)
        .option("numPartitions", p.numPartitions)
    }
    options.foldLeft(parted) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  def write(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Append,
      batchSize: Int = 1000,
      options: Map[String, String] = Map.empty
  ): Unit =
    options
      .foldLeft(
        df.write
          .format("jdbc")
          .option("url", url)
          .option("dbtable", table)
          .option("batchsize", batchSize)
      ) { case (b, (k, v)) => b.option(k, v) }
      .mode(mode)
      .save()
}
