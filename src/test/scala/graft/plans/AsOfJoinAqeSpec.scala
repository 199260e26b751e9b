package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AsOfJoinExec under adaptive query execution: the operator's
  * ENSURE_REQUIREMENTS exchanges must be AQE-readable (coalesced
  * consistently on BOTH children — co-partitioning survives) and the
  * result must match the non-adaptive run.
  */
class AsOfJoinAqeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val left = (0L until 5000L)
      .map(i => (i % 97, i * 7 % 1000, i))
      .toDF("k", "t", "l_payload")
    val right = (0L until 2000L)
      .map(i => (i % 97, i * 13 % 1000, i))
      .toDF("k", "t", "r_payload")
      .select(col("k").as("rk"), col("t").as("rt"), col("r_payload"))
    (left, right)
  }

  test("adaptive run: both child exchanges coalesce consistently; values match non-AQE") {
    val (left, right) = fixture
    val joined = AsOfJoin.joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
    val rows = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    val reads = "AQEShuffleRead".r.findAllIn(plan).size
    assert(reads === 2, s"expected both child exchanges AQE-read, got $reads:\n$plan")
    assert(plan.contains("coalesced"), plan)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plain = AsOfJoin
        .joinAsOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
        .collect()
      assert(rows.map(_.toSeq).toSet === plain.map(_.toSeq).toSet)
      assert(rows.length === plain.length)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
