package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamSegments.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamSegments: OR-merged flags are a CRDT — any slicing,
  * duplicate delivery, or replay converges on batch q96; the live
  * mapGroupsWithState path agrees with the fold.
  */
class StreamSegmentsSpec extends SparkSpec {

  private def batchCells: Seq[Seq[Any]] =
    graft.ops.Relational11
      .queries("q96_segment_overlap")(spark, sfDir)
      .collect()
      .map(_.toSeq)
      .toSeq

  test("replay equals batch q96 at any slice count") {
    val truth = batchCells
    val events = graft.Tables(spark, sfDir).events
    assert(StreamSegments.replay(events, 1).collect().map(_.toSeq).toSeq === truth)
    assert(StreamSegments.replay(events, 5).collect().map(_.toSeq).toSeq === truth)
  }

  test("duplicate delivery (at-least-once) does not change the state") {
    val events = graft.Tables(spark, sfDir).events
    val state = StreamSegments.newState(spark)
    StreamSegments.ingest(state, events)
    // redeliver a slice of the same events wholesale
    StreamSegments.ingest(state, events.filter(pmod(col("event_id"), lit(3)) === 0))
    assert(
      StreamSegments.cells(state).collect().map(_.toSeq).toSeq === batchCells
    )
  }

  test("live mapGroupsWithState path agrees with the fold") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamSegments.start(
      mem.toDS(),
      "seg_sink",
      java.nio.file.Files.createTempDirectory("segck").toString
    )
    try {
      mem.addData(Ev(1, "click"), Ev(1, "view"), Ev(2, "error"))
      q.processAllAvailable()
      mem.addData(Ev(1, "purchase"), Ev(2, "error"), Ev(3, "signup"))
      q.processAllAvailable()
      val rows = spark
        .table("seg_sink")
        .groupBy("user_id")
        .agg(
          max("did_click").as("c"),
          max("did_purchase").as("p"),
          max("did_error").as("e")
        )
        .collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
        .toMap
      assert(rows(1L) === ((true, true, false)))
      assert(rows(2L) === ((false, false, true)))
      assert(rows(3L) === ((false, false, false)))
    } finally q.stop()
  }
}
