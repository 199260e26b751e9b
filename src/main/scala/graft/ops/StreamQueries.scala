package graft.ops

import graft.Tables
import graft.streaming.WindowedEvents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Qx._

/** Event-time window semantics, oracle-checked in batch (Structured
  * Streaming's unified model guarantees the same results for the
  * streaming execution of the same transforms — the streaming path
  * itself is exercised in CdcStreamSpec/WindowedStreamSpec with
  * MemoryStream).
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  final case class SessEv(user_id: Long, event_id: Long, ts_us: Long, value: Double)

  /** The imperative per-key form of stream03's session_window — the
    * KeyValueGroupedDataset surface (`flatMapGroups`) that a custom
    * stateful pass (streaming `flatMapGroupsWithState`) builds on.
    * Session split at gap ≥ 30 min, end = last event + gap; sums
    * replicate Qx.dsum exactly (per-value HALF_UP decimal(18,2)
    * quantization, exact decimal addition — order-independent, so the
    * unsorted fold equals the SQL aggregate bit-for-bit).
    */
  private val sessionsTyped: Q = (s, dir) => {
    import s.implicits._
    val gapUs = 1800L * 1000000L
    val ev = Tables(s, dir).events
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("value")
      )
      .as[SessEv]
    ev.groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SessEv]) =>
        def dec(v: Double) =
          java.math.BigDecimal
            .valueOf(v)
            .setScale(2, java.math.RoundingMode.HALF_UP)
        val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
        var start = 0L
        var prev = 0L
        var n = 0L
        var sum = java.math.BigDecimal.ZERO
        evs.foreach { e =>
          if (n > 0 && e.ts_us - prev >= gapUs) {
            out += ((start, prev + gapUs, uid, n, sum.doubleValue()))
            n = 0
            sum = java.math.BigDecimal.ZERO
          }
          if (n == 0) start = e.ts_us
          n += 1
          sum = sum.add(dec(e.value))
          prev = e.ts_us
        }
        if (n > 0) out += ((start, prev + gapUs, uid, n, sum.doubleValue()))
        out.iterator
      }
      .toDF("start_us", "end_us", "uid", "n_events", "sum_value")
      .select(
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("uid").as("user_id"),
        col("n_events"),
        col("sum_value")
      )
      .orderBy("user_id", "session_start")
  }

  private val tumbling: Q = (s, dir) =>
    WindowedEvents
      .tumblingByType(Tables(s, dir).events)
      .orderBy("window_start", "event_type")

  private val sliding: Q = (s, dir) =>
    WindowedEvents
      .slidingByType(Tables(s, dir).events)
      .orderBy("window_start", "event_type")

  private val sessions: Q = (s, dir) =>
    WindowedEvents
      .sessionsByUser(Tables(s, dir).events)
      .orderBy("user_id", "session_start")

  val queries: Map[String, Q] = Map(
    "stream01_tumbling" -> tumbling,
    "stream02_sliding" -> sliding,
    "stream03_sessions" -> sessions,
    "stream04_sessions_typed" -> sessionsTyped
  )

  /** µs-precision epoch arithmetic mirrors of Spark's window():
    * start = floor(epoch/slide)*slide (minus k·slide for the sliding
    * hops); make_timestamp keeps the naive-UTC type.
    */
  val oracle: Map[String, String] = Map(
    "stream01_tumbling" ->
      s"""SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 * 1000000)
         |    AS window_start,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "stream02_sliding" ->
      s"""SELECT make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - k.k) * 900 * 1000000)
         |    AS window_start,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events CROSS JOIN (VALUES (0), (1)) k(k)
         |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "stream03_sessions" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT user_id, ts, event_id, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT min(ts) AS session_start,
         |  make_timestamp(CAST(epoch_us(max(ts)) AS BIGINT) + 1800 * 1000000)
         |    AS session_end,
         |  user_id, COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    // identical truth to stream03 — the typed flatMapGroups pass must
    // reproduce session_window + dsum exactly
    "stream04_sessions_typed" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT user_id, ts, event_id, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT min(ts) AS session_start,
         |  make_timestamp(CAST(epoch_us(max(ts)) AS BIGINT) + 1800 * 1000000)
         |    AS session_end,
         |  user_id, COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin
  )
}
