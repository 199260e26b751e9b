package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The exact-integer vector substrate shared by the similarity family
  * (sim11/sim18/sim23, the PQ arms, [[IvfStore]]): quantize floats to
  * a fixed micro-unit grid once, then do ALL distance arithmetic in
  * BIGINT — bit-reproducible across engines, partitionings and
  * aggregation orders, where accumulating raw doubles is not. One
  * definition so the grid and the distance rule cannot drift between
  * operators.
  */
object IntVec {

  /** Micro-unit (1e-6 grid) quantization of a float vector column. */
  def quant(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))

  /** Exact squared L2 over equal-length quantized vectors (callers
    * enforce the dims contract — zip_with NULL-pads ragged pairs).
    */
  def dist2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L),
      (acc, x) => acc + x
    )

  /** Deterministic stride-sampled seed/codebook table: the lowest `k`
    * rows of `quantized` (columns `vec_id`, `qe`) with
    * vec_id % stride == 0, numbered 1..k as `idCol`, vector as
    * `vecCol`.
    */
  def strideSeeds(
      quantized: DataFrame,
      stride: Int,
      k: Int,
      idCol: String,
      vecCol: String
  ): DataFrame =
    quantized
      .filter(col("vec_id") % stride === 0)
      .orderBy("vec_id")
      .limit(k)
      .withColumn(
        idCol,
        row_number().over(Window.orderBy(col("vec_id"))).cast("long")
      )
      .select(col(idCol), col("qe").as(vecCol))
}
