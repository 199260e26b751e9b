package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-form ntile: bucket rows by APPROXIMATE quantile cut-points
  * instead of a global-sort window.
  *
  * Exact `ntile(n) OVER (ORDER BY v)` (q37) is a single-reducer
  * operation at any scale — every row moves through one partition to
  * be ranked. At 100 TB the right shape is the one every warehouse
  * uses: compute n-1 quantile cut-points with a mergeable sketch (one
  * partial-aggregate pass, `percentile_approx`), broadcast the tiny
  * cut array, and assign each row's tile map-side — no global sort, no
  * shuffle beyond the aggregate's own.
  *
  * Semantics vs exact ntile, bounded: with rank error eps (<= rows /
  * accuracy), a row's bucket differs from its exact tile by at most 1,
  * and only for rows whose value lies at a cut boundary (ties at a cut
  * are indivisible by value, while ntile splits them by row order) or
  * within the sketch's rank-error window of one. ApproxNtileSpec pins
  * exactly this contract against q37's exact-tile query, and
  * `q98_approx_ntile` gates the operator per-round (accuracy raised
  * above fixture row counts, where the sketch read is the exact
  * order statistic at rank ceil(p*n) and the oracle mirrors it).
  */
object ApproxNtile {

  /** `df` plus a `tile` column in 1..tiles assigned by approximate
    * quantile cut-points of `value` (ascending, NULLs excluded by the
    * caller). One aggregate pass + a broadcast join — map-side after
    * the sketch merge.
    */
  def bucketed(
      df: DataFrame,
      value: Column,
      tiles: Int,
      accuracy: Int = 10000
  ): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val probs = array((1 until tiles).map(i => lit(i.toDouble / tiles)): _*)
    val cuts = df.agg(
      array_sort(percentile_approx(value, probs, lit(accuracy))).as("__cuts")
    )
    // cuts is ONE row of n-1 doubles — broadcast; the per-row tile is
    // 1 + |{c in cuts : v > c}| (cuts ascending), evaluated map-side
    df.crossJoin(broadcast(cuts))
      .withColumn(
        "tile",
        (lit(1) + aggregate(
          col("__cuts"),
          lit(0),
          (acc, c) => acc + when(value > c, 1).otherwise(0)
        )).cast("int")
      )
      .drop("__cuts")
  }
}
