package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed self-join as a bucketed equi-join.
  *
  * `id_b ∈ (id_a, id_a + w]` expressed as a nested-loop range join
  * evaluates its condition O(n²) times — and any expensive predicate
  * the optimizer pushes into the join condition (cosine, Jaccard)
  * gets evaluated per cross pair. Bucketing ids into width-`w` cells
  * and exploding the left side to its two candidate cells turns this
  * into a shuffle equi-join on the cell id: each true pair matches
  * exactly once (b's cell is either a's cell or the next one), cost
  * is O(n·w), and heavy scoring runs only on joined rows. This is the
  * scale-correct shape: shuffle keys are dense, skew-free, and AQE
  * can split hot cells.
  */
object PairJoins {

  def bucketedWindowJoin(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      w: Int
  ): DataFrame = {
    val aExp = a.withColumn(
      "__cell",
      explode(
        array(
          expr(s"$idA div $w"),
          expr(s"$idA div $w") + lit(1L)
        )
      )
    )
    val bKey = b.withColumn("__cell", expr(s"$idB div $w"))
    aExp
      .join(bKey, "__cell")
      .filter(col(idB) > col(idA) && col(idB) <= col(idA) + w)
      .drop("__cell")
  }
}
