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

  /** The ENFORCED hot-bucket ceiling: a bucket whose population
    * exceeds this emits ZERO candidate pairs (surface it via
    * [[bucketAudit]]) instead of an O(population) aggregation buffer
    * and O(population²) pair blow-up. The batch mirror of
    * [[graft.streaming.StreamLshDedup]]'s bounded per-bucket state —
    * a degenerate band bucket (boilerplate-heavy shard surviving
    * exact dedup) is an ADVERSARIAL-input hazard AQE cannot absorb:
    * it can split a hot join partition but not one group's
    * aggregation buffer. Production LSH pipelines drop-and-audit
    * exactly this way; a 4096-member bucket already means ~8M
    * candidate pairs from one signature — noise, not near-dups.
    */
  val DefaultMaxBucket = 4096

  /** Within-bucket candidate pairs in ONE pass: group bucket rows,
    * collect member ids, emit ordered pairs by double-explode —
    * identical pair set to the equi-self-join on the bucket key, at
    * half the cost: the bucket column (usually an expensive sketch) is
    * computed ONCE and the grouped table shuffles ONCE, where the
    * self-join evaluates the sketch and shuffles it on both sides.
    *
    * Memory: one bucket's id list lives in the aggregation buffer
    * (8 B × population) — bounded by the bucket structure itself
    * (2^planes / band count keeps expected population ~n/2^P) AND,
    * against adversarial skew, by `maxBucket`: populations are
    * counted windowed over the same shuffle partitioning BEFORE any
    * list is collected, and over-cap buckets are dropped whole (zero
    * pairs — list them with [[bucketAudit]]). The count pass rides
    * the exchange the aggregation needs anyway; the added cost is one
    * within-partition sort of the bucket keys.
    *
    * Input: one row per (bucket membership); `bucketCols` may be
    * multiple columns (e.g. band index + band signature). Output:
    * distinct (id_a, id_b) with id_a < id_b.
    */
  def bucketedPairs(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame =
    rawBucketedPairs(buckets, bucketCols, idCol, maxBucket).distinct()

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
      idCol: String,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = rawBucketedPairs(buckets, bucketCols, idCol, maxBucket)

  /** The buckets the cap dropped: one row per over-`maxBucket` bucket
    * with its population — the audit a production near-dup net
    * publishes next to its pair stream (pipe04 carries the count in
    * the corpus report). A plain grouped count: map-side partial
    * aggregation, O(1) state per bucket, safe at ANY skew.
    */
  def bucketAudit(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame =
    buckets
      .filter(bucketCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(bucketCols.map(col): _*)
      .agg(count(col(idCol)).as("population"))
      .filter(col("population") > maxBucket)

  private def rawBucketedPairs(
      buckets: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      maxBucket: Int
  ): DataFrame = {
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*)
    buckets
      // equi-join semantics: NULL never matches NULL, but groupBy
      // would happily pool all NULL-bucket rows (e.g. null-text docs
      // whose sketch is NULL) into one bucket and emit spurious pairs
      .filter(bucketCols.map(col(_).isNotNull).reduce(_ && _))
      // population gate BEFORE any per-bucket list exists: the window
      // count's frame is the whole bucket, evaluated streaming over
      // the sorted partition — constant state, never a buffer
      .withColumn("__bkt_n", count(lit(1)).over(byBucket))
      .filter(col("__bkt_n") > 1 && col("__bkt_n") <= maxBucket)
      .groupBy(bucketCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("__ids"))
      .select(col("__ids"), explode(col("__ids")).as("id_a"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_b") > col("id_a"))
  }
}
