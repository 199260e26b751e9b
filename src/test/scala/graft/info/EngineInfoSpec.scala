package graft.info

import graft.SparkSpec
import graft.metrics.MetricsDoc
import org.apache.spark.sql.functions._

class EngineInfoSpec extends SparkSpec {
  import spark.implicits._

  test("health probe and engine meta") {
    assert(EngineInfo.healthy(spark))
    val m = EngineInfo.meta(spark)
    assert(m.engine === "graft-spark")
    assert(m.timezone === "UTC")
  }

  test("selfTest reports SUCCESS per readable table") {
    val checks = EngineInfo.selfTest(spark, sfDir, Seq("region", "nation"))
    assert(checks.map(_.status).distinct === Seq("SUCCESS"))
    assert(checks.find(_.table == "region").get.n_rows === 5L)
  }

  test("selfTest reports FAILED with message for a missing table") {
    val checks = EngineInfo.selfTest(spark, sfDir, Seq("nope"))
    assert(checks.head.status === "FAILED")
    assert(checks.head.error.isDefined)
  }

  test("metric formatters match the reference's golden values") {
    // FIXTURES.md A4: startupTimeMs=87 -> "0.087";
    // used=44398346, max=268435456 -> "16.5%"
    val row = Seq((87L, 44398346L, 268435456L))
      .toDF("ms", "used", "max")
      .select(
        MetricsDoc.msToSeconds(col("ms")).as("s"),
        MetricsDoc.usagePercent(col("used"), col("max")).as("pct"),
        MetricsDoc.bytesToMb(col("used")).as("mb"),
        MetricsDoc.imageType(lit(true)).as("it")
      )
      .head()
    assert(row.getString(0) === "0.087")
    assert(row.getString(1) === "16.5%")
    assert(row.getString(2) === "42.34")
    assert(row.getString(3) === "Native (GraalVM)")
  }
}
