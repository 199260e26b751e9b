package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) key for multi-dimensional data layout.
  *
  * Sorting a table by `zorderKey(x, y)` before writing interleaves
  * the two dimensions' bits, so consecutive rows — and therefore
  * parquet/ORC row groups — cover compact BOXES in (x, y) space
  * instead of thin slices of x only. Min/max stats then prune row
  * groups for predicates on EITHER dimension: a linear sort on x
  * gives perfect pruning on x and none on y; the z-order gives
  * ~√ selectivity pruning on each. This is the layout device Delta's
  * OPTIMIZE ZORDER BY exposes, built here from pure Catalyst
  * expressions (shift/and/or — whole-stage-codegen friendly, no UDF).
  *
  * Inputs are already-bucketed non-negative ints in [0, 2^bits);
  * bucketing (width_bucket / pmod / hash) is the caller's choice
  * because it is data-model policy, not layout mechanics. Bit i of
  * `x` lands at output bit 2i, bit i of `y` at 2i+1, so the key fits
  * in a long for bits ≤ 31.
  */
object ZOrder {

  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      )
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB mirror of [[zorderKey]] for the oracle gate: same
    * bit-placement arithmetic via integer div/mod. */
  def zorderSql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($x) // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((($y) // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
      )
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }
}
