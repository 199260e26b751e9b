package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PairJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("property: bucketed window join == naive range join") {
    val genIds = Gen.listOfN(60, Gen.choose(0L, 200L)).map(_.distinct)
    val prop = Prop.forAll(genIds, Gen.choose(1, 25)) { (ids, w) =>
      val df = ids.toDF("id")
      val a = df.select(col("id").as("id_a"))
      val b = df.select(col("id").as("id_b"))
      val bucketed = PairJoins
        .bucketedWindowJoin(a, b, "id_a", "id_b", w)
        .select("id_a", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = (for {
        x <- ids; y <- ids if y > x && y <= x + w
      } yield (x, y)).toSet
      bucketed == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop
    )
    assert(res.passed, res.status.toString)
  }

  test("bucketedPairs drops NULL bucket keys (equi-join NULL semantics)") {
    val df = Seq(
      (1L, Some(7L)),
      (2L, Some(7L)),
      (3L, None), // NULL bucket: must never pair, even with other NULLs
      (4L, None)
    ).toDF("id", "bx")
    val got = PairJoins
      .bucketedPairs(df, Seq("bx"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === Set((1L, 2L)))
  }

  test("single-membership form == distinct form when each id has one bucket") {
    val rows = (0L until 50L).map(i => (i, i % 7)) // one bucket per id
    val df = rows.toDF("id", "bx")
    val full = PairJoins
      .bucketedPairs(df, Seq("bx"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val single = PairJoins
      .bucketedPairsSingleMembership(df, Seq("bx"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(single.toSet === full.toSet)
    // ...and already duplicate-free without the distinct
    assert(single.length === single.toSet.size)
  }

  test("property: bucketedPairs == bucket equi-self-join pair set") {
    val genRows = Gen.listOfN(
      80,
      for {
        id <- Gen.choose(0L, 40L)
        bx <- Gen.choose(0L, 6L)
        by <- Gen.choose(0L, 2L)
      } yield (id, bx, by)
    )
    val prop = Prop.forAll(genRows) { rows =>
      val df = rows.distinct.toDF("id", "bx", "by")
      val got = PairJoins
        .bucketedPairs(df, Seq("bx", "by"), "id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = (for {
        (i1, x1, y1) <- rows.distinct
        (i2, x2, y2) <- rows.distinct
        if x1 == x2 && y1 == y2 && i2 > i1
      } yield (i1, i2)).toSet
      got == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop
    )
    assert(res.passed, res.status.toString)
  }
}
