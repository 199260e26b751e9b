package graft.sim

import graft.SparkSpec

/** Pins the SEMANTICS of sim28's gated table: retraining must not
  * hurt any query, and on this fixture it strictly recovers the
  * drift-induced recall loss (a fixture-observed magnitude — the
  * one-sided hits_after ≥ hits_before claim is what the design
  * promises; regenerate expectations on a fixture change).
  */
class DriftRecoverySpec extends SparkSpec {

  test("retrain + rebalance recovers nprobe recall lost to drift") {
    val rows = graft.SparkEntry
      .queries("sim28_drift_recovery")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var lost = false
    rows.foreach { r =>
      val nb = r.getAs[Long]("hits_before")
      val na = r.getAs[Long]("hits_after")
      val n = r.getAs[Long]("n_true")
      assert(na >= nb,
        s"query ${r.getAs[Long]("query_id")}: retrain REDUCED recall $nb -> $na")
      assert(na <= n && nb <= n)
      if (nb < n) lost = true
    }
    // the drift genuinely decayed recall somewhere — otherwise the
    // recovery claim is vacuous on this fixture
    assert(lost, "no query lost recall under drift — recovery is vacuous")
    // and after retraining the fixture reads fully recovered
    assert(rows.forall(r =>
      r.getAs[Long]("hits_after") === r.getAs[Long]("n_true")),
      "fixture-observed full recovery no longer holds")
  }
}
