package graft.sources

import graft.functions.Morton
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order-clustered parquet store — the ACTION the q101 layout
  * report justifies (Delta/Iceberg `OPTIMIZE ZORDER BY (x, y)` as a
  * plain-parquet writer): rows are bucketed by the top bits of their
  * Morton value and written `partitionBy(z_bucket)`, so every
  * directory holds an axis-aligned TILE of the (x, y) plane and a
  * 2-D box probe reads only the directories whose tile intersects it
  * — directory-granular data skipping in BOTH dimensions, where a
  * linear sort prunes only its leading column.
  *
  * Scale posture: the write is one hash shuffle on z_bucket (the
  * PartitionedStore clustering — ~1 file per directory per holding
  * shuffle partition); the pruning decision enumerates 2^bucketBits
  * bucket ids on the driver (buckets model FILES, so bucketBits stays
  * ~O(log files)); the read pushes the surviving ids as a partition
  * filter (never lists the other directories) plus the exact residual
  * predicate. A table format refines the same curve to file-footer
  * granularity; the interface (cluster on write, prune on read) is
  * identical.
  *
  * Out-of-domain keys (≥ 2^bits) would silently alias mod 2^bits —
  * stored under a tile that does NOT contain them, so a box probe
  * would MISS them. `write` fails loudly instead (the IvfStore
  * ragged-vector contract).
  */
object ZorderStore {

  /** Write `df` clustered by the Morton bucket of (xCol, yCol). Fails
    * if any key falls outside [0, 2^bits) — aliased keys would break
    * readBox soundness.
    */
  def write(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int,
      bucketBits: Int
  ): Unit = {
    val lim = 1L << bits
    val bad = df
      .filter(
        col(xCol) < 0 || col(xCol) >= lim ||
          col(yCol) < 0 || col(yCol) >= lim
      )
      .limit(1)
      .count()
    require(
      bad == 0,
      s"ZorderStore.write: keys outside [0, 2^$bits) would alias mod " +
        s"2^$bits and make box reads silently incomplete — widen `bits` " +
        "or pre-scale the keys"
    )
    val bucketed = df.withColumn(
      "z_bucket",
      (Morton.zValue(col(xCol), col(yCol), bits) /
        lit(1L << (2 * bits - bucketBits))).cast("long")
    )
    PartitionedStore.write(bucketed, path, Seq("z_bucket"))
  }

  /** Read exactly the rows with x ∈ [x0,x1] and y ∈ [y0,y1]: the
    * surviving bucket ids go in as a partition filter (directory
    * pruning), the box itself as the residual exact predicate.
    */
  def readBox(
      spark: SparkSession,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int,
      bucketBits: Int,
      x0: Long,
      x1: Long,
      y0: Long,
      y1: Long
  ): DataFrame = {
    val buckets = Morton.selectBuckets(bits, bucketBits, x0, x1, y0, y1)
    spark.read
      .parquet(path)
      .filter(
        col("z_bucket").isin(buckets: _*) &&
          col(xCol).between(x0, x1) && col(yCol).between(y0, y1)
      )
  }
}
