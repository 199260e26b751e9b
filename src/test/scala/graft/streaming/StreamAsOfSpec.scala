package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamAsOf.Tagged
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("dim state carries across batches; late dims lose; no retro-enrich") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tagged]
    val q = StreamAsOf
      .enrich(in.toDS())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_enrich_test")
      .start()

    // batch 1: fact before any dim → unenriched; dim@10; fact@15 → dim@10
    in.addData(
      Tagged(1L, 5L, 1L, "fact", 50.0),
      Tagged(1L, 10L, 2L, "dim", 1.0),
      Tagged(1L, 15L, 3L, "fact", 60.0)
    )
    q.processAllAvailable()

    // batch 2: a LATE dim@8 loses to carried dim@10; dim@18 wins; the
    // fact@20 sees dim@18. The batch-1 fact@15 is NOT retro-enriched.
    in.addData(
      Tagged(1L, 8L, 4L, "dim", 9.9),
      Tagged(1L, 18L, 5L, "dim", 2.0),
      Tagged(1L, 20L, 6L, "fact", 70.0)
    )
    q.processAllAvailable()
    q.stop()

    val rows = spark
      .table("asof_enrich_test")
      .collect()
      .map { r =>
        (
          r.getLong(2), // seq
          r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))
        )
      }
      .toSet
    assert(
      rows === Set(
        (1L, 50.0, None, None),
        (3L, 60.0, Some(10L), Some(1.0)),
        (6L, 70.0, Some(18L), Some(2.0))
      )
    )
  }
}
