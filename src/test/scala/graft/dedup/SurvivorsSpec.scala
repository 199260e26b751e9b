package graft.dedup

import graft.SparkSpec

/** dedup13: quality-based survivor selection over the near-dup
  * clusters (the cross-engine check is the recursive-CTE oracle).
  */
class SurvivorsSpec extends SparkSpec {

  test("each cluster keeps exactly its best member") {
    val rows = graft.ops.DedupQueries
      .queries("dedup13_survivors")(spark, sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))
      )
    val docIds = graft
      .Tables(spark, sfDir)
      .documents
      .count()
    assert(rows.length.toLong === docIds, "verdict must cover every doc")
    rows.groupBy(_._2).values.foreach { cl =>
      val kept = cl.filter(_._5)
      assert(kept.length === 1, s"cluster ${cl.head._2}")
      val survivor = kept.head
      // most tokens wins; ties break to the smaller doc_id
      cl.foreach { m =>
        assert(
          m._3 < survivor._3 ||
            (m._3 == survivor._3 && m._1 >= survivor._1),
          s"member ${m._1} beats survivor ${survivor._1}"
        )
      }
      assert(cl.forall(_._4 == survivor._1), "survivor_id inconsistent")
    }
    assert(rows.exists(!_._5), "fixture has no dropped duplicates")
  }
}
