package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers for the query surface.
  *
  * Why decimals: double aggregation is order-dependent, and Spark's
  * partial/final aggregation order differs run-to-run and engine-to-
  * engine. Summing through an exact DECIMAL (inputs here carry ≤2-4
  * fractional digits) makes results bitwise deterministic and equal to
  * the DuckDB oracle's value — and, at scale, independent of partition
  * count. Final outputs cast back to double: no DECIMAL columns leak
  * into results (engines disagree on precision/scale metadata).
  */
object Qx {

  /** Exact, order-independent sum of a ≤`scale`-fractional-digit column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact mean: decimal sum cast to double, divided by non-null count. */
  def dmean(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** Pin a double to a 10^-digits grid via floor(x·10^d + 0.5) — the
    * cross-engine form of round(x, d): the engines' round()
    * implementations disagree on half boundaries (Spark HALF_UP over
    * BigDecimal vs DuckDB's double path — the text20 class), while
    * floor is the same function everywhere. NaN and ±Infinity pass
    * through untouched: Spark's floor(double)→LONG would collapse
    * NaN to 0 and clamp Inf (fabricating a plausible-looking
    * statistic where DuckDB keeps NaN/Inf), so non-finite values skip
    * the grid on both engines identically.
    *
    * Domain: the grid is only meaningful while x·10^d fits a LONG —
    * Spark's floor(double) returns LONG and CLAMPS beyond ±2^63,
    * where DuckDB's floor stays in double. Values with
    * |x·10^d| ≥ 2^63 therefore BYPASS the grid (returned untouched,
    * like NaN/Inf); at those magnitudes a double's ulp exceeds 1, so
    * there is no sub-unit rounding for the grid to pin anyway. Any
    * oracle mirror whose column can reach that range must carry the
    * same CASE guard — current call sites are all far inside it.
    */
  def floorScale(c: Column, digits: Int): Column = {
    val p = lit(math.pow(10.0, digits.toDouble))
    when(
      isnan(c) || c === lit(Double.PositiveInfinity) ||
        c === lit(Double.NegativeInfinity) ||
        abs(c * p) >= lit(9.223372036854776e18),
      c
    ).otherwise(floor(c * p + lit(0.5)).cast(DoubleType) / p)
  }

  /** SQL fragment mirrors (keep in lockstep with the above). */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDmean(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($e)"
}
