package graft.dedup

import graft.SparkSpec

/** dedup14 vs dedup10: the bloom probe is one-sided — every doc the
  * exact broadcast-set pass flags must also be bloom-flagged, and
  * per-doc flagged counts can only exceed the exact shared counts.
  */
class BloomDecontaminateSpec extends SparkSpec {

  test("bloom flags are a superset of exact decontamination flags") {
    val exact = graft.ops.DedupQueries
      .queries("dedup10_decontaminate")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val bloom = graft.ops.DedupQueries
      .queries("dedup14_bloom_decontaminate")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2).toLong, r.getBoolean(3)))
      .toMap
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (id, (nShared, flagged)) =>
      val (nFlagged, bloomFlagged) = bloom(id)
      assert(nFlagged >= nShared, s"doc $id lost a hit (false negative)")
      if (flagged) assert(bloomFlagged, s"doc $id exact-contaminated but not bloom-flagged")
    }
    assert(exact.values.exists(_._2), "fixture has no contaminated docs")
  }
}
