package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: writing both fact tables bucketed (and
  * sorted) on the join key stores co-located partitions, so every
  * subsequent join/aggregate on that key runs WITHOUT an Exchange —
  * at 100 TB this converts the recurring orders⋈lineitem shuffle into
  * a one-time write-side cost. This spec pins the contract: the
  * bucketed sort-merge join plan contains no shuffle and returns the
  * same rows as the shuffled join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without Exchange and matches the shuffled result") {
    val wh = Files.createTempDirectory("graft-bucketed").toAbsolutePath
    val t = Tables(spark, sfDir)
    val bcThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ: a broadcast join would also be exchange-free on the
      // probe side and mask what bucketing provides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      t.orders.write
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", s"$wh/b_orders")
        .mode("overwrite")
        .saveAsTable("b_orders")
      t.lineitem
        .select("l_orderkey", "l_quantity")
        .write
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
      val joined = spark
        .table("b_orders")
        .join(
          spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey")
        )
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)

      val bucketed = joined
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toMap
      val shuffled = t.orders
        .join(
          t.lineitem.select("l_orderkey", "l_quantity"),
          col("o_orderkey") === col("l_orderkey")
        )
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toMap
      assert(bucketed === shuffled)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
