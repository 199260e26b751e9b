package graft.dedup

import graft.SparkSpec
import graft.ops.DedupQueries3
import org.apache.spark.sql.functions._

/** dedup34 invariants beyond the DuckDB value check. */
class SoftDedupSpec extends SparkSpec {

  test("dedup34: weights are per-family uniform and sum to one per family") {
    val df = DedupQueries3
      .queries("dedup34_softdedup_weights")(spark, sfDir)
      .localCheckpoint(true)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every doc appears exactly once
    val docs = graft.Tables(spark, sfDir).documents.count()
    assert(rows.length.toLong === docs)
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val w = r.getAs[Double]("weight")
      assert(sz >= 1L)
      assert(math.abs(w - 1.0 / sz) < 1e-15)
    }
    // expected-copies invariant: Σ weight = number of families (each
    // family contributes expected ONE copy per epoch)
    val nFamilies = df.select(countDistinct(col("cluster_id"))).head().getLong(0)
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - nFamilies.toDouble) < 1e-9, s"$wSum vs $nFamilies")
    // weight 1 exactly for singletons, < 1 otherwise
    rows.foreach { r =>
      if (r.getAs[Long]("cluster_size") == 1L)
        assert(r.getAs[Double]("weight") === 1.0)
      else assert(r.getAs[Double]("weight") < 1.0)
    }
  }
}
