package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text42's sweep must CONTAIN text28's deployed operating point and
  * behave like a threshold sweep (raising the cut can only shrink the
  * kept set).
  */
class PrSweepSpec extends SparkSpec {

  private lazy val sweep =
    graft.SparkEntry
      .queries("text42_pr_sweep")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)

  test("the t=-2 row IS text28's production threshold (qcTau = -0.1)") {
    val kept28 = graft.SparkEntry
      .queries("text28_quality_classifier")(spark, sfDir)
      .filter(col("keep"))
      .count()
    val r = sweep.find(_._1 == -2).get
    assert(r._2 + r._3 === kept28, "tp+fp at t=-2 must equal text28 keeps")
  }

  test("kept set shrinks monotonically as the threshold rises") {
    val kept = sweep.map(r => r._2 + r._3)
    kept.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _           => ()
    }
  }

  test("every row partitions the corpus: tp+fp+fn+tn is constant") {
    val totals = sweep.map(r => r._2 + r._3 + r._4 + r._5).distinct
    assert(totals.length === 1)
    assert(totals.head > 0)
  }
}
