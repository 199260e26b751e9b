package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: a two-phase aggregation where phase
  * 1 aggregates on (key, salt) — spreading a hot key over `salts`
  * reducers — and phase 2 combines the partials per key.
  *
  * With the decimal-exact sums used across this engine (ops.Qx) the
  * two-phase result is bit-identical to the direct aggregation, so the
  * rewrite is safe to apply mechanically when a key's cardinality
  * skews (AQE's skew-join handles joins; this handles aggregations
  * whose partial-combine can't keep up with a hot key at 100 TB).
  *
  * The salt is derived from a stable row attribute, not rand():
  * deterministic replays/retries produce identical partitioning.
  */
object Salting {

  /** Two-phase salted sum/count aggregate.
    *
    * @param saltFrom stable column the salt is hashed from
    * @param sums     (inputColumn → outputName) decimal-exact sums
    */
  def saltedSumCount(
      df: DataFrame,
      keyCol: String,
      saltFrom: Column,
      salts: Int,
      sums: Seq[(Column, String)],
      countName: String
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val partial = salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        sum(sums.head._1.cast("decimal(18,2)")).as(s"__p0"),
        (sums.tail.zipWithIndex.map { case ((c, _), i) =>
          sum(c.cast("decimal(18,2)")).as(s"__p${i + 1}")
        } :+ count(lit(1)).as("__pc")): _*
      )
    partial
      .groupBy(col(keyCol))
      .agg(
        sum(col("__p0")).cast("double").as(sums.head._2),
        (sums.tail.zipWithIndex.map { case ((_, n), i) =>
          sum(col(s"__p${i + 1}")).cast("double").as(n)
        } :+ sum(col("__pc")).as(countName)): _*
      )
  }
}
