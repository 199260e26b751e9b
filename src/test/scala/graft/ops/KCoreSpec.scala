package graft.ops

import graft.SparkSpec

/** dedup20 publishes the 4-round peel as THE 2-core — valid only if
  * the peel has converged by then. Prove it: two extra rounds must
  * change nothing, and every surviving node must satisfy the core
  * invariant (degree ≥ 2 within the surviving subgraph).
  */
class KCoreSpec extends SparkSpec {

  test("4-round peel is the fixpoint (rounds 4 and 6 agree) and core-valid") {
    val r4 = DedupQueries
      .kcoreRounds(spark, sfDir, DedupQueries.KCORE_ROUNDS)
      .collect()
      .map(_.toString)
      .sorted
      .toSeq
    val r6 = DedupQueries
      .kcoreRounds(spark, sfDir, DedupQueries.KCORE_ROUNDS + 2)
      .collect()
      .map(_.toString)
      .sorted
      .toSeq
    assert(r4 === r6, "peel had not converged after KCORE_ROUNDS rounds")
    val degs = DedupQueries
      .kcoreRounds(spark, sfDir, DedupQueries.KCORE_ROUNDS)
      .collect()
      .map(r => r.getLong(r.fieldIndex("deg")))
    assert(degs.forall(_ >= 2), "a surviving node has degree < 2")
  }
}
