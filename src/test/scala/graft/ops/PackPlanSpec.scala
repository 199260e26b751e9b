package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins text10's scale contract: the two-level prefix scan keeps BOTH
  * window levels bounded at ~sqrt(n) rows for any input size (the
  * bucket width is derived from the id domain), and the only
  * unpartitioned window in the plan is the one over bucket totals.
  * Round 4 flagged the fixed width-64 variant: at 10^11 docs its
  * bucket-total table would push ~1.6G rows through one reducer.
  */
class PackPlanSpec extends SparkSpec {
  import spark.implicits._

  test("derived bucket width bounds both window levels at ~sqrt(n)") {
    val n = 10000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      (pmod(col("id") * 37L, lit(91L)) + 1L).as("n_tokens")
    )
    val packed = TextQueries.packChunks(docs, budget = 512L).cache()
    try {
      assert(packed.count() === n)
      // reconstruct the derived width and check both bounds: docs per
      // bucket <= W, bucket count <= ceil(maxId+1 / W) <= W (+1 slack)
      val w = math.max(64L, math.ceil(math.sqrt((n).toDouble)).toLong)
      val perBucket = docs
        .groupBy(expr(s"doc_id div $w"))
        .count()
      assert(perBucket.agg(max("count")).head().getLong(0) <= w)
      assert(perBucket.count() <= w + 1)
    } finally packed.unpersist()
  }

  test("exactly one unpartitioned window, and it runs over bucket totals only") {
    val docs = spark.range(5000L).select(
      col("id").as("doc_id"),
      lit(7L).as("n_tokens")
    )
    val packed = TextQueries.packChunks(docs, budget = 512L)
    // the optimized LOGICAL plan is AQE-independent (the physical tree
    // hides inside AdaptiveSparkPlanExec until execution)
    val windows = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(global.size === 1, s"expected 1 unpartitioned Window, got ${global.size}")
    assert(partitioned.nonEmpty)
    // the unpartitioned window must sit above the bucket-total
    // AGGREGATE — i.e. it ranks buckets, not documents
    val aboveAggregate = global.head.child.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aboveAggregate.nonEmpty,
      s"global window does not sit above the bucket-total aggregate:\n${global.head}")
  }

  test("two-level scan equals the naive global-window prefix") {
    val docs = spark.range(3000L).select(
      col("id").as("doc_id"),
      (pmod(col("id") * 13L, lit(29L)) + 1L).as("n_tokens")
    )
    val budget = 128L
    val got = TextQueries.packChunks(docs, budget)
      .select("doc_id", "chunk_id", "chunk_offset")
    val gw = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("__p", coalesce(sum(col("n_tokens")).over(gw), lit(0L)))
      .select(
        col("doc_id"),
        expr(s"__p div $budget").as("chunk_id"),
        pmod(col("__p"), lit(budget)).as("chunk_offset")
      )
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("an explicit width changes the plan, never the values") {
    val docs = spark.range(1000L).select(
      col("id").as("doc_id"),
      (pmod(col("id") * 11L, lit(17L)) + 1L).as("n_tokens")
    )
    val a = TextQueries.packChunks(docs, 64L, width = Some(10L))
    val b = TextQueries.packChunks(docs, 64L, width = Some(333L))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
