package graft.dedup

import graft.SparkSpec

/** dedup15: the MinHash estimate tracks exact Jaccard inside the
  * K=32 error band on every candidate pair.
  */
class MinhashFidelitySpec extends SparkSpec {

  test("estimates stay within 3 standard errors of exact Jaccard") {
    val rows = graft.ops.DedupQueries
      .queries("dedup15_minhash_fidelity")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty, "no candidate pairs at this SF")
    rows.foreach { case (a, b, est, jac) =>
      val se = math.sqrt(jac * (1 - jac) / 32.0)
      assert(math.abs(est - jac) <= math.max(3 * se, 3.0 / 32),
        s"pair ($a,$b): est=$est jac=$jac")
      assert(est >= 0.0 && est <= 1.0)
    }
  }
}
