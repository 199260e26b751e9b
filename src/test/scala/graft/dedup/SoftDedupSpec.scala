package graft.dedup

import graft.SparkSpec
import graft.ops.DedupQueries3
import org.apache.spark.sql.functions._

/** dedup34 invariants beyond the DuckDB value check. */
class SoftDedupSpec extends SparkSpec {

  test("dedup34: weights are per-family uniform and sum to one per family") {
    val df = DedupQueries3
      .queries("dedup34_softdedup_weights")(spark, sfDir)
      .localCheckpoint(true)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every doc appears exactly once
    val docs = graft.Tables(spark, sfDir).documents.count()
    assert(rows.length.toLong === docs)
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val w = r.getAs[Double]("weight")
      assert(sz >= 1L)
      assert(math.abs(w - 1.0 / sz) < 1e-15)
    }
    // expected-copies invariant: Σ weight = number of families (each
    // family contributes expected ONE copy per epoch)
    val nFamilies = df.select(countDistinct(col("cluster_id"))).head().getLong(0)
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - nFamilies.toDouble) < 1e-9, s"$wSum vs $nFamilies")
    // weight 1 exactly for singletons, < 1 otherwise
    rows.foreach { r =>
      if (r.getAs[Long]("cluster_size") == 1L)
        assert(r.getAs[Double]("weight") === 1.0)
      else assert(r.getAs[Double]("weight") < 1.0)
    }
  }

  test("dedup35: medians match a sequential reference per source") {
    val wts = DedupQueries3
      .queries("dedup34_softdedup_weights")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (1000000L / r.getAs[Long]("cluster_size")))
      .toMap
    val toks = graft
      .Tables(spark, sfDir)
      .documents
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n")
      )
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1), r.getAs[Long]("n")))
    val bySource = toks.groupBy(_._2)
    val got = DedupQueries3
      .queries("dedup35_weighted_profile")(spark, sfDir)
      .collect()
      .map(r =>
        r.getString(0) ->
          (r.getAs[Long]("weighted_median_tokens"), r.getAs[Long]("plain_median_tokens"))
      )
      .toMap
    bySource.foreach { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val tot = sorted.map(d => wts(d._1)).sum
      var cum = 0L
      val wmed = sorted
        .find { d => cum += wts(d._1); 2 * cum >= tot }
        .get
        ._3
      val pmed = sorted((sorted.length + 1) / 2 - 1)._3
      assert(got(src) === ((wmed, pmed)), s"source $src")
    }
  }

  test("WeightedHdr: sketch bucket contains dedup35's exact weighted median") {
    val wts = DedupQueries3
      .queries("dedup34_softdedup_weights")(spark, sfDir)
      .select(
        col("doc_id"),
        expr("1000000 div cluster_size").as("wppm")
      )
    val values = graft
      .Tables(spark, sfDir)
      .documents
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("v")
      )
      .join(wts, Seq("doc_id"))
    val approx = graft.ops.WeightedHdr
      .weightedMedianBuckets(values, Seq("source"), "wppm")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("median_lo"), r.getAs[Long]("median_hi")))
      .toMap
    val exact = DedupQueries3
      .queries("dedup35_weighted_profile")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("weighted_median_tokens"))
      .toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (src, med) =>
      val (lo, hi) = approx(src)
      assert(lo <= med && med < hi, s"$src: exact $med outside [$lo, $hi)")
    }
  }
}
