package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamSourceQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("streamed quota admission equals the batch text13 query under ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    val quota = 800L
    val in = MemoryStream[(Long, String, String)]
    val stream = StreamSourceQuota.applyQuota(
      StreamSourceQuota.tokenized(
        in.toDF().toDF("doc_id", "source", "text")
      ),
      quota
    )
    val q = stream.writeStream
      .format("memory")
      .queryName("quota_sink")
      .outputMode("append")
      .start()
    // replay the corpus in ascending doc_id micro-batches (the
    // ordering contract under which stream == batch)
    val rows = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    rows.grouped(120).foreach { slice =>
      in.addData(slice.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark
      .table("quota_sink")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.SparkEntry
      .queries("text13_source_quota")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("a spent source admits nothing more; quota binds exactly, state is one Long per source") {
    val docs = Seq(
      StreamSourceQuota.DocIn(1L, "a", 300L),
      StreamSourceQuota.DocIn(2L, "a", 400L),
      StreamSourceQuota.DocIn(3L, "a", 200L), // cum 900 > 800: dropped
      StreamSourceQuota.DocIn(4L, "a", 50L),  // cum 950: STILL dropped (budget spent)
      StreamSourceQuota.DocIn(5L, "b", 700L),
      StreamSourceQuota.DocIn(6L, "b", 200L)  // cum 900: dropped
    ).toDS()
    val kept = StreamSourceQuota
      .applyQuota(docs, 800L)
      .collect()
      .map(k => (k.doc_id, k.cum_tokens))
      .toSet
    assert(kept === Set((1L, 300L), (2L, 700L), (5L, 700L)))
  }
}
