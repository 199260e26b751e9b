package graft.cdc

import java.sql.Timestamp

import graft.Schemas.{ChangeEvent, Message}
import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class MaterializerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private def mat(events: Seq[ChangeEvent]): Map[Long, String] =
    MessageStore
      .fromEvents(events.toDS().toDF())
      .findAll()
      .map(m => m.id -> m.content)
      .toMap

  /** Reference model: sequential fold of the log into a Map. */
  private def model(events: Seq[ChangeEvent]): Map[Long, String] =
    events
      .sortBy(e => (e.ts.getTime, e.seq))
      .foldLeft(Map.empty[Long, String]) { (m, e) =>
        e.op match {
          case "D" => m - e.id
          case _   => m + (e.id -> e.content.getOrElse(""))
        }
      }

  test("seed replay yields the reference's 5 rows") {
    val events = graft.Schemas.seedMessages.zipWithIndex.map { case (m, i) =>
      ChangeEvent("I", m.id, Some(m.content), ts(1000L + i), i.toLong)
    }
    assert(mat(events) === model(events))
    assert(mat(events)(3L) === "Direct connection to Cloud SQL")
  }

  test("latest-wins per key with ts then seq tiebreak") {
    val events = Seq(
      ChangeEvent("I", 1L, Some("a"), ts(100), 0),
      ChangeEvent("U", 1L, Some("b"), ts(200), 1),
      ChangeEvent("U", 1L, Some("c"), ts(200), 2), // same ts, higher seq wins
      ChangeEvent("I", 2L, Some("x"), ts(50), 3),
      ChangeEvent("D", 2L, None, ts(60), 4)
    )
    assert(mat(events) === Map(1L -> "c"))
  }

  test("delete is idempotent; delete of absent key is a no-op") {
    val events = Seq(
      ChangeEvent("D", 9L, None, ts(10), 0),
      ChangeEvent("I", 1L, Some("a"), ts(20), 1),
      ChangeEvent("D", 1L, None, ts(30), 2),
      ChangeEvent("D", 1L, None, ts(40), 3)
    )
    assert(mat(events) === Map.empty[Long, String])
  }

  test("property: materialize == sequential Map fold of the log") {
    val genEvent: Gen[(Int, Int, Int, String)] = for {
      op <- Gen.frequency(3 -> "I", 3 -> "U", 2 -> "D")
      id <- Gen.choose(0, 6)
      t <- Gen.choose(0, 20)
      pay <- Gen.alphaStr.map(_.take(4))
    } yield (id, t, 0, op + ":" + pay)
    val genLog = Gen.listOfN(40, genEvent)
    val prop = Prop.forAll(genLog) { raw =>
      val events = raw.zipWithIndex.map { case ((id, t, _, oppay), i) =>
        val Array(op, pay) = oppay.split(":", -1)
        ChangeEvent(
          op,
          id.toLong,
          if (op == "D") None else Some(pay),
          ts(t.toLong * 1000),
          i.toLong
        )
      }
      mat(events) == model(events)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15),
      prop
    )
    assert(res.passed, res.status.toString)
  }

  test("merge applies a delta against existing state incrementally") {
    val state = Seq(Message(1L, "a"), Message(2L, "b")).toDS().toDF()
    val delta = Seq(
      ChangeEvent("U", 2L, Some("b2"), ts(10), 0),
      ChangeEvent("D", 1L, None, ts(11), 1),
      ChangeEvent("I", 3L, Some("c"), ts(12), 2)
    ).toDS().toDF()
    val merged = Materializer
      .merge(state, delta.withColumnRenamed("content", "content"))
      .select("id", "content")
      .as[Message]
      .collect()
      .map(m => m.id -> m.content)
      .toMap
    assert(merged === Map(2L -> "b2", 3L -> "c"))
  }

  test("chained merges are versioned: late deltas lose across batches") {
    val state0 = Seq(Message(1L, "v0")).toDS().toDF()
    val batch1 = Seq(ChangeEvent("U", 1L, Some("v1"), ts(200), 5)).toDS().toDF()
    val state1 = Materializer.merge(state0, batch1)
    assert(state1.columns.contains("ts") && state1.columns.contains("seq"))
    // batch 2 carries only a LATE event (older than v1's ts) — must lose
    val batch2 = Seq(ChangeEvent("U", 1L, Some("late"), ts(100), 3)).toDS().toDF()
    val state2 = Materializer.merge(state1, batch2)
    val row = state2.select("id", "content").as[Message].collect().toSeq
    assert(row === Seq(Message(1L, "v1")))
  }
}
