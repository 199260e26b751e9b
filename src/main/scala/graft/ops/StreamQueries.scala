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
    "stream03_sessions" -> sessions
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
         |ORDER BY user_id, session_start""".stripMargin
  )
}
