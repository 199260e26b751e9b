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

  /** Per group: the first HDR bucket whose cumulative weight reaches
    * half the total (`2·cumw ≥ totw`, division-free — weights should
    * be exact integers, e.g. dedup34's ppm). Windows run over the
    * SKETCH (bounded buckets per group), never the data.
    */
  def weightedMedianBuckets(
      values: DataFrame,
      groupCols: Seq[String],
      weightCol: String
  ): DataFrame = {
    val g = groupCols.map(col)
    val sketch = Relational10
      .hdrBucketRows(values, groupCols, Seq(weightCol))
      .groupBy(g ++ Seq(col("bucket"), col("pw")): _*)
      .agg(sum(col(weightCol)).as("w"))
    val cumW = Window
      .partitionBy(g: _*)
      .orderBy(col("bucket"))
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
