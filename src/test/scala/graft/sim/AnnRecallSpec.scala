package graft.sim

import graft.SparkSpec

/** sim13: recall@k of each ANN arm against the brute-force truth. */
class AnnRecallSpec extends SparkSpec {

  test("recall is consistent with directly-computed arm overlaps") {
    val rows = graft.ops.SimilarityQueries
      .queries("sim13_ann_recall")(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keys.map(_._1).toSet === Set("lsh", "ivf", "prefix"))
    assert(rows.keys.map(_._2).toSet.size === 3) // 3 query vectors
    val truth = graft.ops.SimilarityQueries
      .queries("sim01_topk_bruteforce")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def overlap(q: String): Map[Long, Long] =
      graft.ops.SimilarityQueries
        .queries(q)(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(truth)
        .groupBy(_._1)
        .map { case (k, v) => k -> v.length.toLong }
    val arms = Map(
      "lsh" -> overlap("sim02_topk_lsh"),
      "ivf" -> overlap("sim06_ivf_topk"),
      "prefix" -> overlap("sim12_prefix_rerank")
    )
    rows.foreach { case ((m, q), (nHit, recall)) =>
      assert(nHit === arms(m).getOrElse(q, 0L), s"$m/$q")
      assert(recall === nHit.toDouble / 5)
    }
    // the rerank design premise: the prefix arm must dominate overall
    def total(m: String) = rows.collect { case ((`m`, _), (n, _)) => n }.sum
    assert(total("prefix") >= total("ivf"))
    assert(total("prefix") > total("lsh"))
  }
}
