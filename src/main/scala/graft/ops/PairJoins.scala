package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed self-join as a bucketed equi-join.
  *
  * `id_b ∈ (id_a, id_a + w]` expressed as a nested-loop range join
  * evaluates its condition O(n²) times — and any expensive predicate
  * the optimizer pushes into the join condition (cosine, Jaccard)
  * gets evaluated per cross pair. Bucketing ids into width-`w` cells
  * and exploding the left side to its two candidate cells turns this
  * into a shuffle equi-join on the cell id: each true pair matches
  * exactly once (b's cell is either a's cell or the next one), cost
  * is O(n·w), and heavy scoring runs only on joined rows. This is the
  * scale-correct shape: shuffle keys are dense, skew-free, and AQE
  * can split hot cells.
  */
object PairJoins {

  def bucketedWindowJoin(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      w: Int
  ): DataFrame = {
    val aExp = a.withColumn(
      "__cell",
      explode(
        array(
          expr(s"$idA div $w"),
          expr(s"$idA div $w") + lit(1L)
        )
      )
    )
    val bKey = b.withColumn("__cell", expr(s"$idB div $w"))
    aExp
      .join(bKey, "__cell")
      .filter(col(idB) > col(idA) && col(idB) <= col(idA) + w)
      .drop("__cell")
  }

  /** Within-bucket candidate pairs in ONE pass: group bucket rows,
    * collect member ids, emit ordered pairs by double-explode —
    * identical pair set to the equi-self-join on the bucket key, at
    * half the cost: the bucket column (usually an expensive sketch) is
    * computed ONCE and the grouped table shuffles ONCE, where the
    * self-join evaluates the sketch and shuffles it on both sides.
    *
    * Memory: one bucket's id list lives in the aggregation buffer
    * (8 B × population) — bounded by the bucket structure itself
    * (2^planes / band count keeps expected population ~n/2^P); cap or
    * salt degenerate hot buckets upstream, the same discipline the
    * join form needs for its quadratic output.
    *
    * Input: one row per (bucket membership); `bucketCols` may be
    * multiple columns (e.g. band index + band signature). Output:
    * distinct (id_a, id_b) with id_a < id_b.
    */
  def bucketedPairs(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String
  ): DataFrame =
    rawBucketedPairs(buckets, bucketCols, idCol).distinct()

  /** [[bucketedPairs]] without the final pair-distinct — ONE shuffle
    * total. Correct whenever each id holds a single bucket membership
    * (one blocking key per row, as in fuzzy-ER blocking): a pair can
    * then only ever be emitted by its one shared bucket, so the
    * distinct the multi-band form needs (a pair agreeing on several
    * LSH bands is emitted once per band) would be a pure extra
    * shuffle of the whole candidate set.
    */
  def bucketedPairsSingleMembership(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String
  ): DataFrame = rawBucketedPairs(buckets, bucketCols, idCol)

  private def rawBucketedPairs(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String
  ): DataFrame =
    buckets
      // equi-join semantics: NULL never matches NULL, but groupBy
      // would happily pool all NULL-bucket rows (e.g. null-text docs
      // whose sketch is NULL) into one bucket and emit spurious pairs
      .filter(bucketCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(bucketCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(col("__ids"), explode(col("__ids")).as("id_a"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_b") > col("id_a"))
}
