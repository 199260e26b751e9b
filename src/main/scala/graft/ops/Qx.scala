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

  /** SQL fragment mirrors (keep in lockstep with the above). */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDmean(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($e)"
}
