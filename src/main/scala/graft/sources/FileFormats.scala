package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest/export surface for the text-based interchange formats (CSV,
  * JSON lines) and the columnar ORC alternative to parquet — the
  * formats a pipeline meets at its edges (vendor drops, log shippers,
  * legacy warehouses), distinct from the parquet/ORC it should store
  * analytics data in.
  *
  * Scale discipline baked into the API:
  *   - The schema is ALWAYS explicit. Schema inference reads the data
  *     once to guess types — a full extra pass over 100 TB — and can
  *     infer differently on different samples, silently changing the
  *     pipeline's types between runs. Callers pass a [[StructType]].
  *   - Malformed rows are quarantined, not dropped: PERMISSIVE mode
  *     with a `_corrupt_record` column the caller can route to a
  *     dead-letter sink (a FAILFAST ingest of a 100 TB crawl dies on
  *     the first bad line of a billion).
  *   - Reads are splittable as laid out here: uncompressed or bzip2
  *     CSV/JSON splits by line; gzip does NOT (one task per .gz file —
  *     the classic single-task ingest trap), so writers here default
  *     to no compression for CSV/JSON and columnar-native compression
  *     for ORC.
  *   - ORC carries pushdown/pruning like parquet (min/max strides +
  *     bloom options); CSV/JSON scans still prune COLUMNS at the
  *     parser (Spark's text scans parse only requested fields).
  */
object FileFormats {

  val CorruptColumn = "_corrupt_record"

  /** Schema with the quarantine column appended (PERMISSIVE parses
    * bad rows into it instead of dropping or failing). */
  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptColumn)) schema
    else schema.add(CorruptColumn, "string")

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true
  ): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write
      .option("header", header.toString)
      // line-splittable: no gzip (a .gz csv is one task regardless of size)
      .option("compression", "none")
      .mode("overwrite")
      .csv(path)

  def readJsonLines(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.option("compression", "none").mode("overwrite").json(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.option("compression", "zlib").mode("overwrite").orc(path)
}
