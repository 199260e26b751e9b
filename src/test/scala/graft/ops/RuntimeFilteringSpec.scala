package graft.ops

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime filtering — the two mechanisms that cut a 100 TB fact scan
  * down to the rows a selective dim join can actually match, decided
  * at RUNTIME from the other side of the join (statically, neither
  * filter exists to push down):
  *
  *  - **Bloom runtime filter** (InjectRuntimeFilter): a selective
  *    predicate on one join side builds a bloom filter over its join
  *    keys; `might_contain` is evaluated on the other
  *    side BEFORE its shuffle, shrinking shuffle + join input by the
  *    miss rate. This is the shuffle-join analogue of broadcast
  *    semi-join reduction.
  *  - **Dynamic partition pruning**: when the fact is partitioned on
  *    the join column, the dim side's matched keys become a partition
  *    filter on the fact SCAN itself — whole partitions are never
  *    read. At 100 TB this is the difference between scanning 3 TB
  *    and 100 TB for a one-month query.
  *
  * Values are pinned against the unfiltered plans; the plan strings
  * are asserted so a conf/optimizer regression cannot silently drop
  * the filters.
  */
class RuntimeFilteringSpec extends SparkSpec {

  test("selective dim side injects a bloom runtime filter into the fact side") {
    val t = Tables(spark, sfDir)
    val bcThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join shape the bloom filter exists for, and
      // lower the app-side size gate (sf0.001 scans are tiny)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0"
      )
      val sel = t.orders
        .filter(col("o_totalprice") > 450000) // selective creation side
        .select("o_orderkey")
      val joined = t.lineitem
        .select("l_orderkey", "l_quantity")
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(
        optimized.contains("might_contain") &&
          optimized.contains("bloom_filter_agg"),
        s"no bloom runtime filter injected:\n$optimized"
      )
      val Array(r) = joined.collect()
      val expected = t.lineitem
        .join(
          t.orders.filter(col("o_totalprice") > 450000),
          col("l_orderkey") === col("o_orderkey")
        )
        .count()
      assert(r.getLong(0) === expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThresh)
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      )
    }
  }

  test("dim filter prunes fact partitions dynamically (DPP)") {
    val wh = Files.createTempDirectory("graft-dpp").toAbsolutePath
    val t = Tables(spark, sfDir)
    t.lineitem
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write
      .partitionBy("l_returnflag")
      .mode("overwrite")
      .parquet(s"$wh/li")
    val fact = spark.read.parquet(s"$wh/li")
    import spark.implicits._
    // the dim must be a REAL scan with a surviving Filter node — a
    // LocalRelation constant-folds the predicate away and the pruning
    // rule no longer sees a selective dim side
    Seq(("R", "returned"), ("A", "accepted"), ("N", "neither"))
      .toDF("flag", "label")
      .write
      .mode("overwrite")
      .parquet(s"$wh/dim")
    val dim = spark.read.parquet(s"$wh/dim")
    val joined = fact
      .join(dim.filter(col("label") === "returned"), col("l_returnflag") === col("flag"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(
      plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan"
    )
    val Array(r) = joined.collect()
    val expected = t.lineitem.filter(col("l_returnflag") === "R").count()
    assert(r.getLong(0) === expected && expected > 0)
  }
}
