package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream11's contract, driven through ACTUAL streaming execution:
  * the stream maintains tumbling (window, event_type) counts in
  * complete mode; the top-k leaderboard is rankWindows applied at
  * read time over the sink table — and must equal the batch
  * composition on the same events regardless of how the replay is
  * chunked.
  */
case class TopkEv(ts: Timestamp, event_type: String, value: Double)

class StreamTopkSpec extends SparkSpec {

  test("streamed tumbling counts + read-time rank equal the batch leaderboard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables(spark, sfDir).events
      .select(col("ts"), col("event_type"), col("value"))
      .as[TopkEv]
      .collect()

    val input = MemoryStream[TopkEv]
    val q = WindowedEvents
      .tumblingByType(input.toDF(), watermark = Some("0 seconds"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("topk_counts")
      .start()
    try {
      // chunked replay: three uneven batches
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val served = WindowedEvents
        .rankWindows(spark.table("topk_counts"), 3)
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet
      val batch = graft.ops.StreamQueries
        .queries("stream11_window_topk")(spark, sfDir)
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(served === batch)
      assert(served.nonEmpty)
    } finally q.stop()
  }
}
