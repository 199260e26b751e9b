package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the bounded-disagreement contract between the scale-form
  * quantile bucketing (ApproxNtile — sketch cut-points, no global
  * window) and q37's exact single-reducer ntile: every row's bucket is
  * within 1 tile of exact, disagreements are confined to cut
  * boundaries, and per-tile masses stay balanced. q37 itself remains
  * the spec anchor the approximation is checked against.
  */
class ApproxNtileSpec extends SparkSpec {

  test("approx quartiles disagree with exact ntile by at most 1, only at cut boundaries") {
    val customer = Tables(spark, sfDir).customer
    val exactW = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val exact = customer
      .select(col("c_custkey"), col("c_acctbal"), ntile(4).over(exactW).as("exact_tile"))
    val approx = ApproxNtile
      .bucketed(customer.select(col("c_custkey"), col("c_acctbal")), col("c_acctbal"), 4)
      .withColumnRenamed("tile", "approx_tile")
      .select("c_custkey", "approx_tile")
    val joined = exact.join(approx, "c_custkey").cache()
    try {
      val n = joined.count()
      assert(n === customer.count())

      // contract 1: |approx - exact| <= 1 for EVERY row
      val offByMore = joined
        .filter(abs(col("approx_tile") - col("exact_tile")) > 1)
        .count()
      assert(offByMore === 0L)

      // contract 2: disagreements only at cut boundaries — each
      // disagreeing value must equal the min or max c_acctbal of one
      // of the two tiles it straddles (a tie/rank-error edge), and
      // they are few (the sketch is exact below its accuracy here, so
      // only boundary ties can disagree)
      val tileEdges = joined
        .groupBy("exact_tile")
        .agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"))
        .collect()
        .flatMap(r => Seq(r.getDouble(1), r.getDouble(2)))
        .toSet
      val disagreeing = joined
        .filter(col("approx_tile") =!= col("exact_tile"))
        .select("c_acctbal")
        .collect()
        .map(_.getDouble(0))
      assert(disagreeing.forall(tileEdges.contains),
        s"non-boundary disagreement values: ${disagreeing.filterNot(tileEdges.contains).take(5).mkString(", ")}")
      assert(disagreeing.length <= n / 20,
        s"${disagreeing.length} of $n rows disagree — more than boundary ties explain")

      // contract 3: tile masses stay balanced (each within one
      // boundary-tie cluster of n/4)
      val counts = joined.groupBy("approx_tile").count()
        .collect().map(r => r.getLong(1))
      assert(counts.length === 4)
      counts.foreach(c =>
        assert(math.abs(c - n / 4.0) <= n / 20.0, s"tile mass $c vs ${n / 4}"))
    } finally joined.unpersist()
  }

  test("tile column is monotone in the bucketed value") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), length(col("text")).cast("double").as("len"))
    val tiled = ApproxNtile.bucketed(docs, col("len"), 10)
    val inversions = tiled.alias("a")
      .join(tiled.alias("b"), col("a.len") < col("b.len"))
      .filter(col("a.tile") > col("b.tile"))
      .count()
    assert(inversions === 0L)
  }
}
