package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 32 shuffle partitions — NOT the 200 default, which would produce
  * 6× more tasks than cores on tiny data). On a real cluster the same
  * builder settings apply except `master`, and shuffle partitions are
  * governed by AQE coalescing (`spark.sql.adaptive.*` on below), which
  * is the 100 TB-scale posture: start high, let AQE coalesce.
  */
object GraftSession {
  def local(cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Fixture timestamps: older generations wrote TIMESTAMP(NANOS)
      // (read as ns-longs, truncated in Tables.events), current ones
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) — inferTimestampNTZ
      // off reads those as plain µs TimestampType (= DuckDB's naive
      // read under the pinned UTC session).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // column mapping (ManifestStore.renameColumn): stores stamp
      // stable field ids into their parquet files and resolve columns
      // by id at read time; ignoreMissing keeps plain fixture parquet
      // (no ids) resolving by name as before
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerSketchUdafs(spark)
    // optimizer extension (idempotent): bounded-levenshtein predicates
    // gain the automatic length-band prefilter
    if (!spark.experimental.extraOptimizations.contains(plans.EditDistancePrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.EditDistancePrefilter
    spark
  }

  /** Register the mergeable sketch Aggregators as SQL UDAFs so
    * SQL-only users can call them alongside the `graft_*` expression
    * functions (`GraftExtensions` covers the codegen Expressions;
    * UDAFs register per-session through the udf registry — this is
    * idempotent, call it on any externally-built session):
    *
    *   SELECT graft_hll_distinct(h)  FROM t GROUP BY g   -- DOUBLE
    *   SELECT graft_bloom(h)         FROM t GROUP BY g   -- ARRAY<LONG>
    */
  def registerSketchUdafs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.{functions => F, Encoders}
    spark.udf.register(
      "graft_hll_distinct",
      F.udaf(sim.HllAggregator.distinctEstimate, Encoders.scalaLong)
    )
    spark.udf.register(
      "graft_bloom",
      F.udaf(sim.BloomAggregator.sketch, Encoders.scalaLong)
    )
  }
}
