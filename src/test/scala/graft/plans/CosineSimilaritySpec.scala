package graft.plans

import graft.{SparkSpec, Tables}
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("codegen expression is bitwise-equal to the composed built-in form") {
    val e = Tables(spark, sfDir).embeddings.limit(100)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a
      .join(b, col("id_b") === col("id_a") + 1)
      .select(
        Similarity.cosine(col("va"), col("vb")).as("composed"),
        CosineSimilarity(spark, col("va"), col("vb")).as("fast")
      )
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      )
    }
  }

  test("known values: orthogonal, identical, opposite") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    df.select(
      CosineSimilarity(spark, col("a"), col("b")).as("got"),
      col("expected")
    ).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("interpreted eval path matches codegen (nullSafeEval coverage)") {
    import spark.implicits._
    val df = Seq((Array(0.5f, 0.25f, -1.5f), Array(2.0f, -4.0f, 0.125f)))
      .toDF("a", "b")
    val viaExpr = df
      .select(CosineSimilarity(spark, col("a"), col("b")).as("c"))
      .head()
      .getDouble(0)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ev = CosineSimilarity(
      Literal.create(Array(0.5f, 0.25f, -1.5f), ArrayType(FloatType)),
      Literal.create(Array(2.0f, -4.0f, 0.125f), ArrayType(FloatType))
    )
    val interpreted = ev.eval(null).asInstanceOf[Double]
    assert(
      java.lang.Double.doubleToLongBits(viaExpr) ===
        java.lang.Double.doubleToLongBits(interpreted)
    )
  }
}
