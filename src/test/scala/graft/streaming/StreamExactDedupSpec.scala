package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** dropDuplicatesWithinWatermark-based exact dedup: first arrival per
  * content fingerprint survives, later copies — same batch or later
  * batch — are dropped; survivors match the batch distinct-by-
  * fingerprint; state is watermark-bounded (the operator accepts the
  * stream in append mode with an eviction-capable watermark).
  */
class StreamExactDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("first arrival per fingerprint survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamExactDedup
      .dedup(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("exact_dedup_stream")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft-exdedup").toString
      )
      .start()

    // batch 1: two distinct docs + an in-batch duplicate (whitespace/case
    // variant — the normalization must collapse it)
    input.addData(
      (1L, ts(0), "alpha beta gamma"),
      (2L, ts(1), "delta epsilon"),
      (3L, ts(1), "  Alpha   beta GAMMA ")
    )
    q.processAllAvailable()
    // batch 2: re-send of doc 1's content + one new doc
    input.addData(
      (4L, ts(2), "alpha beta gamma"),
      (5L, ts(3), "zeta eta")
    )
    q.processAllAvailable()
    q.stop()

    val out = spark.table("exact_dedup_stream")
    val survivors = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors === Seq(1L, 2L, 5L), s"got $survivors")

    // ≡ batch semantics: one survivor per distinct fingerprint
    val fps = out.select("fp").distinct().count()
    assert(fps === 3L)
  }
}
