package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream13's contract through ACTUAL streaming execution: a purchase
  * feed replayed in uneven micro-batches, joined per batch against
  * the static customer ⋈ nation dim, aggregated in complete mode —
  * must equal the batch rollup on the same events, and the join must
  * plan as a broadcast (fact rows never shuffle for the join).
  */
case class PurchaseEv(user_id: Long, value: Double)

class StreamStaticEnrichSpec extends SparkSpec {

  test("chunked stream-static replay equals the batch rollup; join broadcasts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t = Tables(spark, sfDir)
    val rows = t.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .as[PurchaseEv]
      .collect()

    // The stateless enrichment plan, checked once in batch for the
    // broadcast: stream-static planning reuses the same join strategy
    // per micro-batch.
    val batchPlan = StreamStaticEnrich
      .enrich(rows.toSeq.toDF("user_id", "value"), t.customer, t.nation)
      .queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"), batchPlan)

    val input = MemoryStream[PurchaseEv]
    val agg = StreamStaticEnrich
      .enrich(input.toDF(), t.customer, t.nation)
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_purchases"),
        graft.ops.Qx.dsum(col("value"), 2).as("revenue")
      )
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("static_enrich")
      .start()
    try {
      val (a, rest) = rows.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      val served = spark.table("static_enrich").collect().map(key).toSet
      val batch = graft.ops.StreamQueries
        .queries("stream13_static_enrich")(spark, sfDir)
        .collect()
        .map(key)
        .toSet
      assert(served === batch)
      assert(served.nonEmpty)
    } finally q.stop()
  }
}
