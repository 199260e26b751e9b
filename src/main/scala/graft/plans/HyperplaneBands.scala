package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused multi-table random-hyperplane LSH: one generated loop turns
  * an `array<float>` embedding into `tables` independent bucket ids
  * (each the sign-bit pattern of `planes` hyperplane projections).
  *
  * Band structure (tables × planes) is what makes embedding near-dup
  * scale: per-table expected bucket population is n/2^planes, so the
  * within-bucket candidate mass is ~tables·n²/2^planes — raising
  * `planes` shrinks it geometrically while the union over independent
  * tables restores recall (the same rows/bands trade MinHash LSH uses
  * in `Dedup.lshCandidatePairs`). A single flat table must choose one
  * point on that curve; bands let recall and cost be tuned separately.
  *
  * Projection parity: table t, local plane p uses the global plane
  * index g = t·planes + p; weight w(g, d) is the portable-hash-derived
  * uniform in [-0.5, 0.5) (`Similarity.planeWeight`), and each
  * projection is the sequential double sum Σ_d double(vec[d])·w(g,d) —
  * bit-identical to `Similarity.lshBucket`'s zip_with/aggregate
  * composition and to the DuckDB list-lambda mirror.
  */
object HyperplaneBands {

  /** weights(g)(d) for global plane g < tables·planes, dim d < dims. */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def weights(nPlanesTotal: Int, dims: Int): Array[Array[Double]] =
    weightCache.computeIfAbsent(
      (nPlanesTotal, dims),
      { case (np, nd) =>
        Array.tabulate(np, nd) { (g, d) =>
          graft.sim.Similarity.planeWeight(g, d).toDouble / 1000.0 - 0.5
        }
      }
    )

  def compute(vec: ArrayData, tables: Int, planes: Int, dims: Int): Array[Long] = {
    val w = weights(tables * planes, dims)
    val n = math.min(vec.numElements(), dims)
    val out = new Array[Long](tables)
    // Empty vector → bucket 0 on every table: the DuckDB mirror's
    // list_aggregate over an empty list is NULL and its CASE WHEN
    // NULL >= 0 picks the no-bit branch — an all-bits-set bucket from
    // `0.0 >= 0.0` here would silently diverge from the gate. Vectors
    // shorter than `dims` project over their own length (also the
    // mirror's semantics); the contract is dims == vector length.
    if (n == 0) return out
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val wg = w(t * planes + p)
        var proj = 0.0
        var d = 0
        while (d < n) {
          proj += vec.getFloat(d).toDouble * wg(d)
          d += 1
        }
        if (proj >= 0.0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  val FUNC_NAME = "graft_hyperplane_bands"

  def apply(spark: SparkSession, vec: Column, tables: Int, planes: Int, dims: Int): Column = {
    val name = FUNC_NAME + s"_${tables}_${planes}_$dims"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => HyperplaneBands(exprs.head, tables, planes, dims),
      "internal"
    )
    call_function(name, vec)
  }
}

/** array<float> → array<long> of `tables` LSH bucket ids. */
case class HyperplaneBands(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if tables > 0 && planes > 0 && planes <= 63 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands expects array<float> with 0 < planes <= 63; got " +
            s"${other.simpleString}, tables=$tables, planes=$planes"
        )
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneBands.compute(input.asInstanceOf[ArrayData], tables, planes, dims)
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.HyperplaneBands.compute($c, $tables, $planes, $dims));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
