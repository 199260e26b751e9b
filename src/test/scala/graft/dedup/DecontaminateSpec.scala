package graft.dedup

import graft.SparkSpec

/** dedup10: train/eval shingle-overlap decontamination, checked
  * against a driver-side brute force over the same sketch (the
  * independent-formulation check is the DuckDB oracle, which
  * reconstructs the shingles in SQL).
  */
class DecontaminateSpec extends SparkSpec {

  test("dedup10 equals brute force overlap counts") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalSet = docs
      .filter(_._2 == "src0")
      .flatMap(d => graft.plans.ShingleHashes.compute(d._3))
      .toSet
    val expected = docs
      .filter(_._2 != "src0")
      .map { case (id, _, text) =>
        val sh = graft.plans.ShingleHashes.compute(text)
        val shared = sh.toSet.intersect(evalSet).size.toLong
        (id, sh.length, shared, shared >= 5)
      }
      .toSet
    assert(expected.exists(_._4), "fixture has no contaminated docs")
    assert(expected.exists(!_._4), "fixture is all-contaminated")
    val got = graft.ops.DedupQueries
      .queries("dedup10_decontaminate")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === expected)
  }
}
