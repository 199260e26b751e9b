package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted quantiles from the q85 HDR sketch — the mergeable,
  * bounded-state scale form of dedup35's exact weighted median: the
  * same log-bucket layout with `SUM(weight)` per bucket in place of
  * `COUNT(*)`. Sketches from corpus slices merge by plain weight
  * addition, so the profile composes across shards/days exactly like
  * q85's (`streaming.StreamHdrQuantiles` shape); per-group state stays
  * ≤ ~1K buckets regardless of corpus size.
  *
  * Guarantee (spec-pinned in SoftDedupSpec against dedup35's exact
  * windowed form): the returned bucket contains the true weighted
  * median — `median_lo ≤ exact < median_hi` — so the value-domain
  * error is one bucket width (~2^-HDR_S relative). dedup35 is the
  * exact semantics this approximation is checked against; at mega-
  * source scale this is the form to run. Gated as
  * `dedup37_weighted_hdr_median` (the oracle reconstructs the sketch
  * in SQL), alongside the SoftDedupSpec containment pin.
  */
object WeightedHdr {

  /** The sketch itself: per-(group, bucket) weight sums — bounded,
    * mergeable by plain addition. Callers that need both the median
    * read and sketch statistics should build this ONCE (it is
    * bucket-count-sized — an ideal checkpoint) and pass it to
    * [[weightedMedianFromSketch]]; values with a NULL `v` must be
    * excluded by the caller (a NULL bucket would sort differently
    * between engines — the dedup35 NULLS hazard).
    */
  def sketch(
      values: DataFrame,
      groupCols: Seq[String],
      weightCol: String
  ): DataFrame = {
    val g = groupCols.map(col)
    Relational10
      .hdrBucketRows(values, groupCols, Seq(weightCol))
      .groupBy(g ++ Seq(col("bucket"), col("pw")): _*)
      .agg(sum(col(weightCol)).as("w"))
  }

  /** Per group: the first HDR bucket whose cumulative weight reaches
    * half the total (`2·cumw ≥ totw`, division-free — weights should
    * be exact integers, e.g. dedup34's ppm). Windows run over the
    * SKETCH (bounded buckets per group), never the data.
    */
  def weightedMedianBuckets(
      values: DataFrame,
      groupCols: Seq[String],
      weightCol: String
  ): DataFrame =
    weightedMedianFromSketch(sketch(values, groupCols, weightCol), groupCols)

  /** Median read over an already-built `(group..., bucket, pw, w)`
    * sketch frame.
    */
  def weightedMedianFromSketch(
      sketch: DataFrame,
      groupCols: Seq[String]
  ): DataFrame = {
    val g = groupCols.map(col)
    val cumW = Window
      .partitionBy(g: _*)
      // NULLS LAST pinned explicitly (Spark default is NULLS FIRST,
      // DuckDB's is NULLS LAST) — callers exclude NULL buckets, this
      // keeps the read deterministic even if one slips through
      .orderBy(col("bucket").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(g: _*)
    sketch
      .withColumn("cumw", sum(col("w")).over(cumW))
      .withColumn("totw", sum(col("w")).over(whole))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(g: _*)
      .agg(min(struct(col("bucket"), col("pw"))).as("__b"))
      .select(
        g ++ Seq(
          col("__b.bucket").as("median_lo"),
          (col("__b.bucket") + col("__b.pw")).as("median_hi")
        ): _*
      )
  }
}
