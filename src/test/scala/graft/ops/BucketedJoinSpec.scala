package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Bucketing is THE shuffle eliminator for repeated co-located joins:
  * write both fact tables bucketed (and sorted) by the join key once,
  * and every subsequent join on that key is exchange-free — at 100 TB
  * the difference between re-shuffling both inputs per query and a
  * zero-movement merge. This spec proves the engine's bucketed-write
  * path produces scans Spark recognizes as co-partitioned: the join
  * plan contains NO ShuffleExchange on either input, and the result
  * matches the plain (shuffling) join.
  *
  * Env-bound (writes warehouse tables), hence spec-only — no DuckDB
  * oracle entry: DuckDB has no bucketed-table notion to mirror.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins with zero shuffle exchanges") {
    val t = Tables(spark, sfDir)
    val nBuckets = 4
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    t.orders
      .select("o_orderkey", "o_orderpriority")
      .write
      .bucketBy(nBuckets, "o_orderkey")
      .sortBy("o_orderkey")
      .mode("overwrite")
      .saveAsTable("b_orders")
    t.lineitem
      .select("l_orderkey", "l_extendedprice")
      .write
      .bucketBy(nBuckets, "l_orderkey")
      .sortBy("l_orderkey")
      .mode("overwrite")
      .saveAsTable("b_lineitem")
    try {
      val joined = spark
        .table("b_lineitem")
        .hint("merge") // pin SMJ: broadcast would hide the co-location
        .join(
          spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey")
        )
      // count with AQE OFF: AdaptiveSparkPlanExec exposes no children
      // to foreach, so the zero-shuffle assert would hold vacuously
      // (the PlanBudgetSpec lesson)
      val orig = spark.conf.get("spark.sql.adaptive.enabled")
      val shuffles =
        try {
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          var n = 0
          joined.queryExecution.executedPlan.foreach {
            case _: ShuffleExchangeLike => n += 1
            case _                      => ()
          }
          assert(
            !joined.queryExecution.executedPlan.getClass.getSimpleName
              .contains("Adaptive"),
            "shuffle counting ran under AQE — vacuous"
          )
          n
        } finally spark.conf.set("spark.sql.adaptive.enabled", orig)
      assert(
        shuffles == 0,
        s"bucketed join must be exchange-free, found $shuffles shuffles"
      )
      // and it computes the same join as the plain (shuffling) path
      val expected = t.lineitem
        .select("l_orderkey", "l_extendedprice")
        .join(
          t.orders.select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey")
        )
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
