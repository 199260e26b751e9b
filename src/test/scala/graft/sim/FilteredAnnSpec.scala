package graft.sim

import graft.SparkSpec

/** Pins sim29's strategy-comparison semantics: post-filtering can
  * never beat the exact pre-filtered top-k, its hit count is bounded
  * by the shortlist's matching rows, and on this fixture the
  * selectivity genuinely starves the k·3 shortlist — the measured
  * reason filter-aware serving exists.
  */
class FilteredAnnSpec extends SparkSpec {

  test("post-filter is one-sided worse and the fixture shows real misses") {
    val rows = graft.SparkEntry
      .queries("sim29_filtered_ann")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var miss = false
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_exact")
      val ph = r.getAs[Long]("post_hits")
      val sm = r.getAs[Long]("shortlist_matches")
      assert(ph <= ne, s"${r.getAs[Long]("query_id")}: post beat exact")
      assert(ph <= sm, s"${r.getAs[Long]("query_id")}: hits exceed matches")
      // when the shortlist holds >= k matching rows, the post arm's
      // picks are the true filtered top-k prefix — full recall
      if (sm >= graft.ops.SimilarityQueries3.FILT_TOPK)
        assert(ph === ne,
          s"${r.getAs[Long]("query_id")}: saturated shortlist still missed")
      if (ph < ne) miss = true
    }
    assert(miss, "no post-filter miss on the fixture — comparison is vacuous")
  }
}
