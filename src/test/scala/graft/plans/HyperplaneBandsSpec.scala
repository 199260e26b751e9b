package graft.plans

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class HyperplaneBandsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent composed-HOF evaluation of table `tbl`'s bucket —
    * the zip_with/aggregate form the fused expression replaces. */
  private def composedBucket(vec: Column, tbl: Int, planes: Int, dims: Int): Column =
    (0 until planes)
      .map { p =>
        val g = tbl * planes + p
        val weights = lit(
          (0 until dims)
            .map(d => Similarity.planeWeight(g, d).toDouble / 1000.0 - 0.5)
            .toArray
        )
        val proj = aggregate(
          zip_with(vec, weights, (x, w) => x.cast("double") * w),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  test("fused multi-table bands equal the composed per-table buckets") {
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 64L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val df = vecs.toDF("id", "vec")
    val tables = 3
    val planes = 16
    val withBoth = df
      .withColumn("bands", HyperplaneBands(spark, col("vec"), tables, planes, 8))
      .select(
        col("id") +: (0 until tables).map(t =>
          (col("bands").getItem(t) === composedBucket(col("vec"), t, planes, 8))
            .as(s"eq$t")
        ): _*
      )
      .collect()
    assert(withBoth.forall(r => (1 to tables).forall(i => r.getBoolean(i))))
  }

  test("empty vector buckets to 0 on every table (oracle NULL-CASE parity)") {
    val df = Seq((1L, Array.empty[Float]), (2L, Array(0.5f, -0.25f)))
      .toDF("id", "vec")
    val rows = df
      .select(col("id"), HyperplaneBands(spark, col("vec"), 2, 16, 8).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    assert(rows(1L) === Seq(0L, 0L))
    // a short-but-nonempty vector projects over its own length: the
    // fused form (dims=8, 2-element vec) must equal the composed form
    // restricted to 2 dims — same weights 0..1, same partial sums
    val short = df
      .filter(col("id") === 2L)
      .select(
        (0 until 2).map(t =>
          (HyperplaneBands(spark, col("vec"), 2, 16, 8).getItem(t) ===
            composedBucket(col("vec"), t, 16, 2)).as(s"eq$t")
        ): _*
      )
      .collect()
    assert(short.forall(r => (0 until 2).forall(i => r.getBoolean(i))))
  }

  test("table 0 with matching plane count equals Similarity.lshBucket") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 32L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val df = vecs.toDF("id", "vec")
    val rows = df
      .select(
        HyperplaneBands(spark, col("vec"), 1, 8, 8).getItem(0).as("fused"),
        Similarity.lshBucket(col("vec"), 8, 8).as("composed")
      )
      .collect()
    assert(rows.forall(r => r.getLong(0) === r.getLong(1)))
  }
}
