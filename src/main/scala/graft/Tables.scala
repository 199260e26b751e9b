package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` — columnar scans with
  * Catalyst predicate pushdown / column pruning downstream. The one
  * normalization: `events.ts` is written as parquet TIMESTAMP(NANOS),
  * which Spark cannot represent natively; we read it as nanosecond
  * longs (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microsecond TimestampType, matching DuckDB's read of the same file.
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
        // nanosAsLong read path: ns since epoch → µs TimestampType
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
      case _: TimestampType => raw
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
