package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.Schemas.{ChangeEvent, Message}
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)
  private def ckpt() =
    Files.createTempDirectory("graft-ckpt").toAbsolutePath.toString

  test("foreachBatch upsert materializes across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val initial = Seq(Message(1L, "seed")).toDS().toDF()
    val (q, handle) = CdcStream.upsertQuery(input.toDS(), initial, ckpt())

    input.addData(
      ChangeEvent("I", 2L, Some("two"), ts(100), 1),
      ChangeEvent("U", 1L, Some("seed2"), ts(110), 2)
    )
    q.processAllAvailable()
    val s1 = CdcStream
      .asMessages(spark, handle)
      .collect()
      .map(m => m.id -> m.content)
      .toMap
    assert(s1 === Map(1L -> "seed2", 2L -> "two"))

    // second micro-batch: delete + late event that must LOSE (the
    // state is versioned, so cross-batch latest-wins holds)
    input.addData(
      ChangeEvent("D", 2L, None, ts(200), 3),
      ChangeEvent("U", 1L, Some("stale"), ts(50), 0)
    )
    q.processAllAvailable()
    q.stop()
    val s2 = CdcStream
      .asMessages(spark, handle)
      .collect()
      .map(m => m.id -> m.content)
      .toMap
    assert(s2 === Map(1L -> "seed2"))
  }

  test("mapGroupsWithState latest-wins with tombstone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = CdcStream.statefulQuery(input.toDS(), "cdc_state_test", ckpt())

    input.addData(
      ChangeEvent("I", 1L, Some("a"), ts(100), 0),
      ChangeEvent("U", 1L, Some("b"), ts(200), 1),
      ChangeEvent("I", 2L, Some("x"), ts(100), 2)
    )
    q.processAllAvailable()
    input.addData(ChangeEvent("D", 2L, None, ts(300), 3))
    q.processAllAvailable()
    val rows = spark
      .table("cdc_state_test")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2)))
    q.stop()
    // batch 1 emitted (1,b,true),(2,x,true); batch 2 emitted (2,None,false)
    assert(rows.contains((1L, Some("b"), true)))
    assert(rows.contains((2L, Some("x"), true)))
    assert(rows.contains((2L, None, false)))
  }

  test("assignIds in foreachBatch issues a dense sequence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    // driver-held state snapshot (the test's stand-in for the sink
    // table); each batch assigns keys against it, then appends
    @volatile var state: Seq[(Long, String)] =
      Seq(1L -> "a", 2L -> "b", 5L -> "e")
    val q = input
      .toDF()
      .toDF("content", "ts", "seq")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val stateDf = state.toDF("id", "content")
        val assigned = graft.cdc.Materializer
          .assignIds(batch, stateDf, "id", "ts", "seq")
          .select(col("id"), col("content"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)))
        state = state ++ assigned
      }
      .start()
    // batch 1: two keyless inserts, out of ts order — ids follow
    // (ts, seq) rank on top of max(existing)=5
    input.addData(("second", ts(200), 7L), ("first", ts(100), 3L))
    q.processAllAvailable()
    assert(
      state.toSet === Set(
        1L -> "a", 2L -> "b", 5L -> "e", 6L -> "first", 7L -> "second"
      )
    )
    // batch 2 continues the sequence from the new max
    input.addData(("third", ts(300), 9L))
    q.processAllAvailable()
    q.stop()
    assert(state.toMap.get(8L) === Some("third"))
    assert(state.map(_._1).sorted === Seq(1L, 2L, 5L, 6L, 7L, 8L))
  }

  test("windowed streaming agg equals batch result (unified model)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input
      .toDF()
      .toDF("ts", "user_id", "event_type", "value")
    val q = WindowedEvents
      .tumblingByType(events, watermark = Some("10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_test")
      .start()
    val batch = Seq(
      (ts(0L), 1L, "view", 1.0),
      (ts(30 * 60 * 1000L), 1L, "view", 2.0),
      (ts(90 * 60 * 1000L), 2L, "click", 5.0)
    )
    input.addData(batch: _*)
    q.processAllAvailable()
    val streamed = spark
      .table("win_test")
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    q.stop()
    val batchDf = WindowedEvents
      .tumblingByType(
        batch.toDF("ts", "user_id", "event_type", "value")
      )
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === batchDf.toSeq)
  }
}
