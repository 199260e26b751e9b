package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming deduplication: `dropDuplicatesWithinWatermark` bounds the
  * dedup state by event time — the streaming face of the dedup family
  * (exact dedup at unbounded scale needs bounded state).
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("duplicate events within the watermark window are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = input
      .toDF()
      .toDF("id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft-dd").toString
      )
      .start()
    val h0 = 3600L * 1000
    input.addData(
      (1L, ts(h0), "a"),
      (1L, ts(h0 + 1000), "a-dup"),
      (2L, ts(h0 + 2000), "b")
    )
    q.processAllAvailable()
    input.addData((1L, ts(h0 + 3000), "a-dup2"), (3L, ts(h0 + 4000), "c"))
    q.processAllAvailable()
    val rows = spark
      .table("dedup_stream")
      .collect()
      .map(r => (r.getLong(0), r.getString(2)))
    q.stop()
    assert(rows.count(_._1 == 1L) === 1)
    assert(rows.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(rows.contains((1L, "a"))) // first occurrence wins
  }
}
