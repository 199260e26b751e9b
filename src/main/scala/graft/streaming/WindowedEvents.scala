package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time windowed aggregations over the `events` shape
  * (ts, user_id, event_type, value). Each transform works identically
  * on a batch DataFrame and a streaming DataFrame (Structured
  * Streaming's unified model); the streaming path adds a watermark for
  * state eviction / late-data policy (SURVEY.md §2.9 — the reference
  * has no streaming semantics, so the policy here is ours: events
  * later than the watermark are dropped).
  */
object WindowedEvents {

  /** Exact decimal sum of `value` (order-independent; see ops.Qx). */
  private def dsumValue: Column =
    sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)

  /** Tumbling 1-hour windows per event_type. */
  def tumblingByType(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumValue.as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )
  }

  /** Sliding 30-minute windows every 15 minutes, per event_type. */
  def slidingByType(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumValue.as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )
  }

  /** Read-time top-k view over maintained tumbling counts — the
    * streaming leaderboard pattern: ranking inside the streaming
    * query would need a second stateful stage (unsupported after an
    * agg in update mode), so the STREAM maintains the per-(window,
    * type) counts and the rank is applied at serve time over the
    * sink table. Works identically over the batch counts, which is
    * how the oracle pins it.
    */
  def rankWindows(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn(
        "rank",
        row_number().over(
          Window
            .partitionBy(col("window_start"))
            .orderBy(col("n").desc, col("event_type").asc)
        )
      )
      .filter(col("rank") <= k)
      .select(col("window_start"), col("rank"), col("event_type"), col("n"))
  }

  /** Session windows per user with a 30-minute inactivity gap.
    * (`session_window` works in batch too; end = last event + gap.)
    */
  def sessionsByUser(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsumValue.as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("n_events"),
        col("sum_value")
      )
  }
}
