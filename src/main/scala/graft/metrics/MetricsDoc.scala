package graft.metrics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's derived-metrics formatters (SURVEY.md §2.8 F1-F6,
  * F9: reference MetricsController.java:34-87 /
  * MetricsResource.java:32-62) as reusable column expressions, plus
  * the nested-JSON document constructor.
  */
object MetricsDoc {

  /** F2: milliseconds → `"%.3f"`-formatted seconds. */
  def msToSeconds(ms: Column): Column =
    format_string("%.3f", ms.cast("double") / 1000.0)

  /** F3: bytes → `"%.2f"`-formatted MB. */
  def bytesToMb(bytes: Column): Column =
    format_string("%.2f", bytes.cast("double") / (1024.0 * 1024.0))

  /** F4: used/max → `"%.1f%%"` percentage string. */
  def usagePercent(used: Column, max: Column): Column =
    concat(
      format_string("%.1f", used.cast("double") * 100.0 / max.cast("double")),
      lit("%")
    )

  /** F5: ISO-8601 UTC instant string. */
  def isoNow(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** F6/P5: native-image flag → human label. */
  def imageType(isNative: Column): Column =
    when(isNative, lit("Native (GraalVM)")).otherwise(lit("JVM"))

  /** F9: the nested metrics JSON document (memory + jvm sub-objects),
    * mirroring the reference's LinkedHashMap → Jackson shape.
    */
  def metricsJson(
      startupMs: Column,
      usedBytes: Column,
      maxBytes: Column,
      isNative: Column
  ): Column =
    to_json(
      struct(
        msToSeconds(startupMs).as("startupTimeSeconds"),
        struct(
          bytesToMb(usedBytes).as("usedMB"),
          bytesToMb(maxBytes).as("maxMB"),
          usagePercent(usedBytes, maxBytes).as("usagePercent")
        ).as("memory"),
        struct(
          imageType(isNative).as("imageType")
        ).as("jvm")
      )
    )
}
