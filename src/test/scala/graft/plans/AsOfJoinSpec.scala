package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches the naive per-key reference (randomized)") {
    val genLeft = Gen.listOfN(
      120,
      for {
        k <- Gen.choose(0L, 8L)
        t <- Gen.choose(0L, 40L)
      } yield (k, t)
    )
    // distinct (key, time) on the right so the payload of a tie is
    // unambiguous in the reference
    val genRight = Gen
      .listOfN(
        80,
        for {
          k <- Gen.choose(0L, 10L)
          t <- Gen.choose(0L, 40L)
        } yield (k, t)
      )
      .map(_.distinct)

    val prop = Prop.forAll(genLeft, genRight) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs
        .map { case (k, t) => (k, t, s"p$k-$t") }
        .toDF("rk", "rt", "payload")
      val got = AsOfJoin
        .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
        .select(col("lid"), col("rt"), col("payload"))
        .collect()
        .map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
        )
        .toMap
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter { case (rk, rt) => rk == k && rt <= t }
        (i.toLong, if (m.isEmpty) None else Some(m.map(_._2).max))
      }.toMap
      got == expected
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("forward as-of matches the naive per-key reference (randomized)") {
    val genLeft = Gen.listOfN(
      100,
      for {
        k <- Gen.choose(0L, 8L)
        t <- Gen.choose(0L, 40L)
      } yield (k, t)
    )
    val genRight = Gen
      .listOfN(
        70,
        for {
          k <- Gen.choose(0L, 10L)
          t <- Gen.choose(0L, 40L)
        } yield (k, t)
      )
      .map(_.distinct)
    val prop = Prop.forAll(genLeft, genRight) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("rk", "rt")
      val got = AsOfJoin
        .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt", forward = true)
        .select(col("lid"), col("rt"))
        .collect()
        .map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
        )
        .toMap
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val m = rs.filter { case (rk, rt) => rk == k && rt >= t }
        (i.toLong, if (m.isEmpty) None else Some(m.map(_._2).min))
      }.toMap
      got == expected
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("nearest as-of matches the naive per-key reference (randomized)") {
    val genLeft = Gen.listOfN(
      100,
      for {
        k <- Gen.choose(0L, 8L)
        t <- Gen.choose(0L, 40L)
      } yield (k, t)
    )
    val genRight = Gen
      .listOfN(
        70,
        for {
          k <- Gen.choose(0L, 10L)
          t <- Gen.choose(0L, 40L)
        } yield (k, t)
      )
      .map(_.distinct)
    val genTol = Gen.oneOf(None, Some(3L), Some(10L))
    val prop = Prop.forAll(genLeft, genRight, genTol) { (ls, rs, tol) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("rk", "rt")
      val got = AsOfJoin
        .joinAsOf(
          left,
          right,
          Seq("k"),
          Seq("rk"),
          "t",
          "rt",
          nearest = true,
          tolerance = tol
        )
        .select(col("lid"), col("rt"))
        .collect()
        .map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
        )
        .toMap
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val inTol = (d: Long) => tol.forall(d <= _)
        val back = rs.collect {
          case (rk, rt) if rk == k && rt <= t && inTol(t - rt) => rt
        }.maxOption
        val fwd = rs.collect {
          case (rk, rt) if rk == k && rt >= t && inTol(rt - t) => rt
        }.minOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) => Some(if (t - b <= f - t) b else f)
          case (b, f)             => b.orElse(f)
        }
        (i.toLong, pick)
      }.toMap
      got == expected
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("nearest requires a long-backed time column and excludes forward") {
    val left = Seq((1L, 1L)).toDF("k", "t")
    val right = Seq((1L, 1L)).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.joinAsOf(
        left,
        right,
        Seq("k"),
        Seq("rk"),
        "t",
        "rt",
        forward = true,
        nearest = true
      )
    }
    val lDate = Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("k", "t")
    val rDate = Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin
        .joinAsOf(lDate, rDate, Seq("k"), Seq("rk"), "t", "rt", nearest = true)
    }
  }

  test("tolerance + inner match the naive per-key reference (randomized)") {
    val genLeft = Gen.listOfN(
      100,
      for {
        k <- Gen.choose(0L, 8L)
        t <- Gen.choose(0L, 40L)
      } yield (k, t)
    )
    val genRight = Gen
      .listOfN(
        70,
        for {
          k <- Gen.choose(0L, 10L)
          t <- Gen.choose(0L, 40L)
        } yield (k, t)
      )
      .map(_.distinct)
    val genTol = Gen.choose(0L, 12L)
    val prop = Prop.forAll(genLeft, genRight, genTol, Gen.oneOf(true, false)) {
      (ls, rs, tol, fwd) =>
        val left = ls.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "t")
        val right = rs.toDF("rk", "rt")
        val got = AsOfJoin
          .joinAsOf(
            left,
            right,
            Seq("k"),
            Seq("rk"),
            "t",
            "rt",
            forward = fwd,
            tolerance = Some(tol),
            inner = true
          )
          .select(col("lid"), col("rt"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .toMap
        val expected = ls.zipWithIndex.flatMap { case ((k, t), i) =>
          val m =
            if (fwd) rs.filter { case (rk, rt) => rk == k && rt >= t && rt - t <= tol }
            else rs.filter { case (rk, rt) => rk == k && rt <= t && t - rt <= tol }
          if (m.isEmpty) None
          else Some((i.toLong, if (fwd) m.map(_._2).min else m.map(_._2).max))
        }.toMap
        got == expected
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("tie contract: equal right (key, time) rows match on time; payload unspecified among ties") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    // two right rows at exactly t = 10: both are ≤ t (inclusive); which
    // payload wins is sort-order-unspecified — the contract pins only
    // the matched TIME
    val right = Seq((1L, 10L, "x"), (1L, 10L, "y"), (1L, 4L, "old"))
      .toDF("rk", "rt", "payload")
    val r = AsOfJoin
      .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("rt"), col("payload"))
      .collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 10L)
    assert(Set("x", "y").contains(r(0).getString(1)))
    // forward direction: same tie, inclusive ≥
    val f = AsOfJoin
      .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt", forward = true)
      .select(col("rt"), col("payload"))
      .collect()
    assert(f.length === 1 && f(0).getLong(0) === 10L)
    assert(Set("x", "y").contains(f(0).getString(1)))
  }

  test("null key/time violates the contract loudly, not silently") {
    val left = Seq((Some(1L), Some(10L)), (None, Some(20L)))
      .toDF("k", "t")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
    val e = intercept[Exception] {
      AsOfJoin.joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.toLowerCase.contains("null")))
  }

  test("inner as-of preserves right-side partitioning: no re-shuffle for a right-key agg") {
    val left = spark
      .range(100)
      .select(col("id").as("k"), (col("id") % 10).as("t"))
    val right = spark
      .range(50)
      .select(col("id").as("rk"), (col("id") % 7).as("rt"))
    val agg = AsOfJoin
      .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt", inner = true)
      .groupBy(col("rk"))
      .count()
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // two shuffles co-partition the join inputs; the right-key agg
    // must reuse the join's PartitioningCollection, not add a third
    assert(exchanges === 2, s"expected 2 exchanges, plan:\n$plan")
    // inner semantics: left rows survive iff a same-key right row has
    // rt <= t — i.e. k < 50 (right keys stop at 49) and k%7 <= k%10
    val expected = (0 until 100).count(k => k < 50 && k % 7 <= k % 10)
    assert(agg.collect().map(_.getLong(1)).sum === expected.toLong)
  }

  test("empty right side yields all-null right columns") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long)].toDF("rk", "rt")
    val rows = AsOfJoin
      .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("shared lineage (two filters of one table) resolves cleanly") {
    val base = Seq(
      (1L, 5L, "a"),
      (1L, 7L, "b"),
      (2L, 3L, "a"),
      (2L, 9L, "b")
    ).toDF("k", "t", "tag")
    val l = base.filter(col("tag") === "b").select(col("k"), col("t"))
    val r = base
      .filter(col("tag") === "a")
      .select(col("k").as("rk"), col("t").as("rt"))
    val got = AsOfJoin
      .joinAsOf(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("k"), col("rt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === Set((1L, 5L), (2L, 3L)))
  }
}
