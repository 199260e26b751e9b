package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** stream15's live behavior: the LEFT OUTER stream-stream join emits
  * matched rows as they join and NULL-PADDED rows only after the
  * watermark proves no match can still arrive (state eviction). The
  * replayed feed — with sentinel rows pushing the watermark past
  * every real signup's bound — must equal the batch left join.
  */
case class OjPurchase(user_id: Long, purchase_ts: Timestamp,
    purchase_event: Long, value: Double)
case class OjSignup(s_user: Long, signup_ts: Timestamp, signup_event: Long)

class StreamOuterJoinSpec extends SparkSpec {

  test("outer stream-stream replay equals the batch left join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = Tables(spark, sfDir).events
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("event_id").as("purchase_event"),
        col("value")
      )
      .as[OjPurchase]
      .collect()
      .sortBy(_.purchase_ts.getTime)
    val signups = ev
      .filter(col("event_type") === "signup")
      .select(
        col("user_id").as("s_user"),
        col("ts").as("signup_ts"),
        col("event_id").as("signup_event")
      )
      .as[OjSignup]
      .collect()
      .sortBy(_.signup_ts.getTime)

    val maxTs = (purchases.map(_.purchase_ts.getTime) ++
      signups.map(_.signup_ts.getTime)).max
    // far enough that every signup's bound + slack is behind the
    // watermark once the sentinels are processed
    val sentinelTs = new Timestamp(maxTs + 10L * 24 * 3600 * 1000)

    val pIn = MemoryStream[OjPurchase]
    val sIn = MemoryStream[OjSignup]
    val joined = StreamJoins.purchaseAttributionOuter(pIn.toDF(), sIn.toDF())
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("outer_join_sink")
      .start()
    try {
      val (p1, p2) = purchases.splitAt(purchases.length / 2)
      val (s1, s2) = signups.splitAt(signups.length / 2)
      pIn.addData(p1.toSeq); sIn.addData(s1.toSeq); q.processAllAvailable()
      pIn.addData(p2.toSeq); sIn.addData(s2.toSeq); q.processAllAvailable()
      // sentinels on BOTH inputs (global watermark = min over inputs),
      // twice: the first batch advances the watermark, the second lets
      // the eviction that watermark unlocked emit its null-padded rows
      (1 to 2).foreach { i =>
        pIn.addData(OjPurchase(-999L, sentinelTs, -i.toLong, 0.0))
        sIn.addData(OjSignup(-999L, sentinelTs, -i.toLong))
        q.processAllAvailable()
      }
      def key(r: org.apache.spark.sql.Row) = (
        r.getLong(r.fieldIndex("s_user")),
        r.getTimestamp(r.fieldIndex("signup_ts")),
        r.getLong(r.fieldIndex("signup_event")),
        Option(r.getAs[java.lang.Long]("purchase_event")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("value")).map(_.toDouble)
      )
      val served = spark
        .table("outer_join_sink")
        .filter(col("signup_event") >= 0 && col("s_user") >= 0)
        .filter(col("purchase_event").isNull || col("purchase_event") >= 0)
        .collect()
        .map(key)
        .toSet
      val batch = StreamJoins
        .purchaseAttributionOuter(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("purchase_ts"),
              col("event_id").as("purchase_event"), col("value")),
          ev.filter(col("event_type") === "signup")
            .select(col("user_id").as("s_user"), col("ts").as("signup_ts"),
              col("event_id").as("signup_event"))
        )
        .collect()
        .map(key)
        .toSet
      assert(served === batch)
      // the outer semantics actually exercised: some signups unmatched
      assert(batch.exists(_._4.isEmpty))
    } finally q.stop()
  }
}
