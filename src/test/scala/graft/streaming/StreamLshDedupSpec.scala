package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamLshDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a null-text record neither kills the stream nor pairs with other nulls") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamLshDedup
      .candidates(in.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("lsh_dedup_null_test")
      .start()
    in.addData((1L, "some real document"), (2L, null), (3L, null))
    q.processAllAvailable() // must not throw
    q.stop()
    assert(spark.table("lsh_dedup_null_test").count() === 0)
  }

  test("arriving duplicates are flagged against all prior ingests; pairs never repeat") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamLshDedup
      .candidates(docs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("lsh_dedup_test")
      .start()

    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val otherText = "completely different content about distributed query engines"

    // batch 1: first copy + an unrelated doc → no pairs yet
    in.addData((1L, dupText), (2L, otherText))
    q.processAllAvailable()
    assert(spark.table("lsh_dedup_test").count() === 0)

    // batch 2: a duplicate of doc 1 → flagged on arrival
    in.addData((3L, dupText))
    q.processAllAvailable()
    val afterB2 = spark
      .table("lsh_dedup_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(afterB2 === Set((1L, 3L)))

    // batch 3: another duplicate → paired with BOTH prior copies;
    // re-sending doc 3 adds nothing (bucket membership is stateful)
    in.addData((4L, dupText), (3L, dupText))
    q.processAllAvailable()
    q.stop()
    val afterB3 = spark
      .table("lsh_dedup_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(afterB3 === Set((1L, 3L), (1L, 4L), (3L, 4L)))
  }
}
