package graft.dedup

import graft.SparkSpec

/** Pins dedup36's contract against dedup31's exact verdicts — the
  * exact↔sketch pairing discipline: the sketch's error must be
  * one-sided (the rerank cosine is TRUE cosine, so a max over a
  * shortlist can only under-reach) and its verdict recall measured
  * and floored.
  */
class SemanticDeconSketchSpec extends SparkSpec {

  private def verdicts(name: String): Map[Long, (Long, Double, Boolean)] =
    graft.SparkEntry
      .queries(name)(spark, sfDir)
      .collect()
      .map(r =>
        r.getAs[Long]("vec_id") ->
          ((
            r.getAs[Long]("nearest_eval"),
            r.getAs[Double]("max_sim"),
            r.getAs[Boolean]("contaminated")
          ))
      )
      .toMap

  test("sketch verdicts: one-sided error, recall >= 0.9 vs dedup31 exact") {
    val exact = verdicts("dedup31_semantic_decontaminate")
    val sk = verdicts("dedup36_semantic_decon_sketch")
    assert(sk.keySet === exact.keySet, "both forms audit every corpus vector")

    // structural precision: a sketch max_sim is a max over a SUBSET
    // of the true candidates, so it can never exceed the exact one —
    // and therefore every sketch-flagged vector is exactly-flagged
    sk.foreach { case (v, (_, skSim, skFlag)) =>
      val (_, exSim, exFlag) = exact(v)
      assert(skSim <= exSim + 1e-12, s"vec $v sketch $skSim > exact $exSim")
      assert(!skFlag || exFlag, s"vec $v flagged by sketch but not exact")
    }

    // recall floor on the fixture (measured 55/56 = 0.98 at 288 bits
    // / shortlist 8; floored at 0.9 to absorb fixture drift)
    val exFlagged = exact.collect { case (v, (_, _, true)) => v }.toSet
    val caught = exFlagged.count(v => sk(v)._3)
    assert(exFlagged.nonEmpty, "fixture must exercise the contaminated arm")
    val recall = caught.toDouble / exFlagged.size
    assert(
      recall >= 0.9,
      s"verdict recall $caught/${exFlagged.size} = $recall < 0.9"
    )

    // where the sketch agrees it is EXACT: same nearest eval id means
    // bit-identical max_sim (same dot-product fold on both paths)
    sk.foreach { case (v, (skNe, skSim, _)) =>
      val (exNe, exSim, _) = exact(v)
      if (skNe == exNe)
        assert(skSim === exSim, s"vec $v same nearest but different sim")
    }
  }
}
