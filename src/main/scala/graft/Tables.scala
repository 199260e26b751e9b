package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` — columnar scans with
  * Catalyst predicate pushdown / column pruning downstream. The one
  * normalization: `events.ts`. Fixture generations have written it as
  * parquet TIMESTAMP(NANOS) (unrepresentable in Spark → read as
  * ns-longs via `spark.sql.legacy.parquet.nanosAsLong` and truncated
  * to µs) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TimestampNTZ unless `spark.sql.parquet.inferTimestampNTZ.enabled`
  * is off, as our sessions set). All branches land on µs
  * TimestampType under the pinned UTC session — bit-identical to
  * DuckDB's naive read of the same file.
  */
final case class Tables(spark: SparkSession, dir: String) {

  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanosAsLong read path: ns since epoch → µs TimestampType.
        // Integer `div`, NOT `/`: double division loses µs precision
        // at epoch-ns magnitudes (53-bit mantissa < 2^60 ns values).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampType => raw
      case _: TimestampNTZType =>
        // Externally-built session without inferTimestampNTZ=false:
        // reinterpret the wall-clock value in the (UTC) session zone.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
