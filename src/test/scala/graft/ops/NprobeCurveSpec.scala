package graft.ops

import graft.SparkSpec

/** sim25's shape invariants, beyond the gate's exact values: a probe
  * budget can only ADD candidates, so cost and recall must both be
  * non-decreasing in nprobe, and probing every list IS brute force —
  * recall exactly 1 at the saturated end.
  */
class NprobeCurveSpec extends SparkSpec {

  private lazy val curve =
    graft.SparkEntry
      .queries("sim25_nprobe_curve")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("candidate cost and recall are monotone in the probe budget") {
    curve.sliding(2).foreach {
      case Array((p0, c0, h0, r0), (p1, c1, h1, r1)) =>
        assert(c1 >= c0, s"candidates shrank $p0->$p1")
        assert(h1 >= h0, s"hits shrank $p0->$p1")
        assert(r1 >= r0, s"recall shrank $p0->$p1")
      case _ => ()
    }
  }

  test("the saturated budget recovers brute force exactly") {
    assert(curve.last._4 === 1000000L, "recall_ppm at max nprobe")
  }
}
