package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // offset all event times well past the epoch: the query's initial
  // watermark is 1970-01-01T00:00Z, so epoch-adjacent rows would sit
  // beyond their eviction horizon from batch 1 and be dropped before
  // the other side arrives
  private val base = 100L * 24 * 3600 * 1000
  private def ts(ms: Long) = new Timestamp(base + ms)

  test("stream-stream interval join matches in-bound pairs and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp, Long, Double)]
    val sIn = MemoryStream[(Long, Timestamp, Long)]
    val purchases = pIn
      .toDF()
      .toDF("user_id", "purchase_ts", "purchase_event", "value")
    val signups = sIn.toDF().toDF("s_user", "signup_ts", "signup_event")
    val q = StreamJoins
      .purchaseAttribution(purchases, signups)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sj_test")
      .start()

    // batch 1: signup at t0, purchase 30 min later → in bound, joins
    sIn.addData((1L, ts(0L), 100L))
    pIn.addData((1L, ts(30L * 60 * 1000), 200L, 9.99))
    q.processAllAvailable()
    assert(spark.table("sj_test").count() === 1)

    // batch 2: advance both watermarks ~10 h — far past signup 100's
    // eviction horizon (signup_ts + bound + slack); the same-instant
    // pair for user 2 joins (bounds are inclusive)
    sIn.addData((2L, ts(10L * 3600 * 1000), 101L))
    pIn.addData((2L, ts(10L * 3600 * 1000), 201L, 1.0))
    q.processAllAvailable()
    assert(spark.table("sj_test").count() === 2)

    // batch 3: a purchase 40 min after signup 100 — in bound by event
    // time, but the signup's state row is evicted (and the row itself
    // is behind the purchase watermark) → no output. This is the state
    // cleanup that makes the join O(in-flight window), not O(history).
    pIn.addData((1L, ts(40L * 60 * 1000), 202L, 5.0))
    q.processAllAvailable()
    assert(spark.table("sj_test").count() === 2)

    // the state store kept only the in-horizon rows (user-2 pair), not
    // all 5 inputs
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty)
    assert(st(0).numRowsTotal <= 3, s"state not evicted: ${st(0).numRowsTotal} rows")
    q.stop()
  }

  test("batch execution of the same join equals a plain equi+range join") {
    val pu = Seq(
      (1L, ts(30L * 60 * 1000), 200L, 9.99),
      (1L, ts(2L * 3600 * 1000), 201L, 1.0),
      (2L, ts(1000L), 202L, 2.0)
    ).toDF("user_id", "purchase_ts", "purchase_event", "value")
    val su = Seq(
      (1L, ts(0L), 100L),
      (2L, ts(500L), 101L)
    ).toDF("s_user", "signup_ts", "signup_event")
    val got = StreamJoins
      .purchaseAttribution(pu, su)
      .select("purchase_event", "signup_event")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // purchase 201 is 2 h after signup 100 → out of the 1 h bound
    assert(got === Set((200L, 100L), (202L, 101L)))
  }
}
