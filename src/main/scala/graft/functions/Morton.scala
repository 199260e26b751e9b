package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve arithmetic, shared by the q101 layout
  * report and the [[graft.sources.ZorderStore]] writer so the two
  * cannot drift. Bit i of x lands at z position 2i, bit i of y at
  * 2i+1. Everything is integer division/modulo — no bit builtins —
  * so the Spark and DuckDB forms are the same function
  * symbol-for-symbol (the portable-hash discipline applied to a
  * space-filling curve).
  *
  * Keys wider than `bits` don't contribute their high bits (mod-2^bits
  * tiling): correctness of anything built on zone maps or exact
  * filters is unaffected, pruning degrades — the undersized-ZORDER-
  * budget failure mode. [[graft.sources.ZorderStore.write]] fails
  * loudly on out-of-domain keys instead of silently aliasing.
  */
object Morton {

  /** z = interleave(low `bits` of x, low `bits` of y). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits)
      .map { i =>
        (x.cast("long") / lit(1L << i)).cast("long") % 2L *
          lit(1L << (2 * i)) +
          (y.cast("long") / lit(1L << i)).cast("long") % 2L *
            lit(1L << (2 * i + 1))
      }
      .reduce(_ + _)

  /** The SQL mirror of [[zValue]] (DuckDB `//` = floor division;
    * operands are non-negative so trunc ≡ floor on both engines).
    */
  def sqlZValue(x: String, y: String, bits: Int): String =
    (0 until bits)
      .map { i =>
        s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)}" +
          s" + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
      }
      .mkString(" + ")

  /** A bucket (the top `bucketBits` bits of z) covers an axis-aligned
    * TILE of the key plane — the property pruning rests on: returns
    * (xmin, xmax, ymin, ymax) inclusive.
    */
  def tile(
      bucket: Long,
      bits: Int,
      bucketBits: Int
  ): (Long, Long, Long, Long) = {
    val shift = 2 * bits - bucketBits
    var xmin = 0L
    var ymin = 0L
    (0 until bucketBits).foreach { j =>
      val p = shift + j
      if (((bucket >> j) & 1L) == 1L) {
        if (p % 2 == 0) xmin |= 1L << (p / 2)
        else ymin |= 1L << (p / 2)
      }
    }
    val xFree = (0 until shift).count(_ % 2 == 0)
    val yFree = shift - xFree
    (xmin, xmin + (1L << xFree) - 1, ymin, ymin + (1L << yFree) - 1)
  }

  /** Bucket ids whose tile intersects the inclusive box — the driver-
    * side pruning decision (2^bucketBits candidates; bucketBits stays
    * small because buckets model FILES/directories, not rows).
    */
  def selectBuckets(
      bits: Int,
      bucketBits: Int,
      x0: Long,
      x1: Long,
      y0: Long,
      y1: Long
  ): Seq[Long] =
    (0L until (1L << bucketBits)).filter { b =>
      val (xmin, xmax, ymin, ymax) = tile(b, bits, bucketBits)
      xmin <= x1 && xmax >= x0 && ymin <= y1 && ymax >= y0
    }

  /** SQL mirrors of [[tile]]'s corners for a bucket-id expression —
    * lets an oracle re-derive the pruning decision with the same
    * arithmetic (`range(0, 2^bucketBits)` + these four columns).
    */
  def sqlTileXmin(b: String, bits: Int, bucketBits: Int): String = {
    val shift = 2 * bits - bucketBits
    val terms = (0 until bucketBits).collect {
      case j if (shift + j) % 2 == 0 =>
        s"(($b // ${1L << j}) % 2) * ${1L << ((shift + j) / 2)}"
    }
    if (terms.isEmpty) "0" else terms.mkString(" + ")
  }

  def sqlTileYmin(b: String, bits: Int, bucketBits: Int): String = {
    val shift = 2 * bits - bucketBits
    val terms = (0 until bucketBits).collect {
      case j if (shift + j) % 2 == 1 =>
        s"(($b // ${1L << j}) % 2) * ${1L << ((shift + j) / 2)}"
    }
    if (terms.isEmpty) "0" else terms.mkString(" + ")
  }

  /** Inclusive tile widths minus one, for the SQL mirrors' xmax/ymax. */
  def tileXSpan(bits: Int, bucketBits: Int): Long = {
    val shift = 2 * bits - bucketBits
    (1L << (0 until shift).count(_ % 2 == 0)) - 1
  }

  def tileYSpan(bits: Int, bucketBits: Int): Long = {
    val shift = 2 * bits - bucketBits
    (1L << (0 until shift).count(_ % 2 == 1)) - 1
  }
}
