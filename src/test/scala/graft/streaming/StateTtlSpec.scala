package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.Schemas.ChangeEvent
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StateTtlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private def ckpt() =
    Files.createTempDirectory("graft-ttl").toAbsolutePath.toString

  test("keys expire once the watermark passes their TTL horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val withWm = input.toDS().withWatermark("ts", "0 seconds").as[ChangeEvent]
    val q = StateTtl
      .applyWithTtl(withWm, ttlMs = 60 * 1000L)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("ttl_test")
      .option("checkpointLocation", ckpt())
      .start()

    val h0 = 3600L * 1000
    input.addData(
      ChangeEvent("I", 1L, Some("a"), ts(h0), 0),
      ChangeEvent("I", 2L, Some("b"), ts(h0 + 1000), 1)
    )
    q.processAllAvailable()
    // advance event time far past key 1+2's TTL via a new key
    input.addData(ChangeEvent("I", 3L, Some("c"), ts(h0 + 10 * 60 * 1000), 2))
    q.processAllAvailable()
    // one more batch so timeouts (computed against the new watermark) fire
    input.addData(ChangeEvent("U", 3L, Some("c2"), ts(h0 + 11 * 60 * 1000), 3))
    q.processAllAvailable()
    val rows = spark
      .table("ttl_test")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
    q.stop()
    assert(rows.contains((1L, true, false))) // initial upsert emission
    assert(rows.contains((1L, false, true))) // expired
    assert(rows.contains((2L, false, true)))
    assert(rows.exists(r => r._1 == 3L && r._2)) // survivor still live
  }

  test("health listener reports ready + live after first batch") {
    implicit val sqlCtx = spark.sqlContext
    val l = HealthListener.attach(spark)
    val input = MemoryStream[ChangeEvent]
    val q = input
      .toDS()
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("health_test")
      .option("checkpointLocation", ckpt())
      .start()
    input.addData(ChangeEvent("I", 1L, Some("x"), ts(1000), 0))
    q.processAllAvailable()
    q.stop()
    // the listener bus delivers onQueryProgress ASYNCHRONOUSLY — under
    // full-suite load the event can land after processAllAvailable
    // returns, so poll (bounded) instead of asserting immediately
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while ((!l.isReady || l.totalRows < 1L) && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(l.isReady)
    assert(l.totalRows >= 1L)
    assert(l.error.isEmpty)
    spark.streams.removeListener(l)
  }
}
