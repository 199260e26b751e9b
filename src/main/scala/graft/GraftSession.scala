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
      // events.parquet carries TIMESTAMP(NANOS): read as ns-longs,
      // Tables.events truncates to µs TimestampType (= DuckDB's read).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
