package graft.sim

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Baseline: brute-force cosine top-k (a broadcast of the query set
  * against the corpus — one map-side pass + a top-k per query, no
  * all-pairs shuffle). Scale path: random-hyperplane LSH bucketing —
  * signatures are per-row expressions, the candidate join shuffles on
  * the bucket id only, so cost is corpus-linear + per-bucket quadratic
  * rather than global-quadratic.
  *
  * All arithmetic is explicit double (`float → double` casts before
  * multiply, sequential left-to-right list sums) so results are
  * bit-identical to the DuckDB oracle's list-lambda mirror.
  */
object Similarity {

  /** Sequential-order dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with the zero-norm case pinned to 0.0 (never NaN): NaN
    * comparison/ordering semantics differ between Spark filters,
    * window sorts, and the DuckDB oracle, so the surface defines the
    * degenerate case away instead of leaning on fixture data.
    */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (na * nb))
  }

  /** Brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (query rows themselves excluded by id).
    *
    * The query side is small by construction — broadcast it so the
    * corpus is scanned exactly once with no shuffle before top-k.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("query_vec")
    )
    val scored = corpus
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        graft.plans
          .CosineSimilarity(corpus.sparkSession, col("query_vec"), col(vecCol))
          .as("cos_sim")
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * uniform in [-0.5, 0.5), derived from the portable hash so the
    * DuckDB oracle reproduces it exactly. Evaluated at plan-build
    * time — the weights are literals in the executed plan.
    */
  def planeWeight(plane: Int, d: Int): Long =
    PortableHash.h32Local(s"${plane}_$d") % 1000L

  /** Random-hyperplane LSH bucket id over `nPlanes` sign bits.
    * `dims` must match the embedding dimensionality.
    *
    * Composed higher-order-function form — interpreted per plane, so
    * the serving queries use [[lshBucketFused]] (one generated loop,
    * bit-identical: HyperplaneBandsSpec) and this stays as the
    * readable semantic reference the parity spec checks against.
    */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes)
      .map { p =>
        val weights = lit(
          (0 until dims)
            .map(d => planeWeight(p, d).toDouble / 1000.0 - 0.5)
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

  /** Fused codegen form of [[lshBucket]]: table 0 of the multi-table
    * `HyperplaneBands` expression (same global plane indices 0..n-1,
    * same sequential projection sums — value-identical). A NULL
    * vector is pinned to bucket 0: the composed form's per-plane
    * `when(NULL >= 0.0, bit).otherwise(0)` and the DuckDB mirror's
    * CASE both yield 0, while the null-intolerant fused expression
    * would null-propagate — coalesce keeps the three in lockstep.
    */
  def lshBucketFused(
      spark: org.apache.spark.sql.SparkSession,
      vec: Column,
      nPlanes: Int,
      dims: Int
  ): Column =
    coalesce(
      element_at(graft.plans.HyperplaneBands(spark, vec, 1, nPlanes, dims), 1),
      lit(0L)
    )

  /** LSH-bucketed ANN: candidates share a bucket; exact cosine rank
    * within the candidate set. Misses cross-bucket neighbors —
    * that is the approximation trade.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      dims: Int = 64
  ): DataFrame = {
    val spark = corpus.sparkSession
    val withBucket =
      corpus.withColumn("bucket", lshBucketFused(spark, col(vecCol), nPlanes, dims))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .withColumn("bucket", lshBucketFused(spark, col("query_vec"), nPlanes, dims))
    val scored = withBucket
      .join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        graft.plans
          .CosineSimilarity(corpus.sparkSession, col("query_vec"), col(vecCol))
          .as("cos_sim")
      )
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
