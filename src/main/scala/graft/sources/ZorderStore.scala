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
    * if any key is NULL or falls outside [0, 2^bits): an aliased key
    * would be stored under a tile that doesn't contain it, and a NULL
    * key would land in the hive default partition — both unreachable
    * by `readBox`'s pruned predicates, i.e. silently incomplete
    * reads. The guard rides the z_bucket projection itself
    * (raise_error inside the write job — one pass over the source,
    * not a separate validation scan); a failed job never commits, so
    * the store is untouched on rejection.
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
    val inDomain = col(xCol).isNotNull && col(yCol).isNotNull &&
      col(xCol) >= 0 && col(xCol) < lim &&
      col(yCol) >= 0 && col(yCol) < lim
    val bucketed = df.withColumn(
      "z_bucket",
      when(
        inDomain,
        (Morton.zValue(col(xCol), col(yCol), bits) /
          lit(1L << (2 * bits - bucketBits))).cast("long")
      ).otherwise(
        raise_error(
          concat(
            lit(
              s"ZorderStore.write: NULL or out-of-[0, 2^$bits) key would " +
                "alias and make box reads silently incomplete — widen " +
                s"`bits` or pre-scale the keys; got ($xCol, $yCol) = ("
            ),
            coalesce(col(xCol).cast("string"), lit("NULL")),
            lit(", "),
            coalesce(col(yCol).cast("string"), lit("NULL")),
            lit(")")
          )
        ).cast("long")
      )
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
