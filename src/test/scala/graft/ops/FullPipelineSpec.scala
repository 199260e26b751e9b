package graft.ops

import graft.SparkSpec

/** pipe03: the composed pipeline agrees with its member passes. */
class FullPipelineSpec extends SparkSpec {

  test("composition respects each member pass") {
    val out = graft.SparkEntry
      .queries("pipe03_full_pipeline")(spark, sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
      )
    assert(out.nonEmpty)
    val ids = out.map(_._1).toSet
    // never the benchmark source
    assert(out.forall(_._2 != "src0"))
    // subset of the survivor keep list
    val keep = DedupQueries
      .queries("dedup13_survivors")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(ids.subsetOf(keep))
    // disjoint from the contaminated set
    val contam = DedupQueries
      .queries("dedup10_decontaminate")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("contaminated"))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(ids.intersect(contam).isEmpty)
    // the pipeline must actually drop something at each gate class
    assert(out.length < keep.size, "quota/contamination gates never bound")
    // packing invariant: offsets stay inside the budget and chunks
    // advance monotonically in doc_id order
    val sorted = out.sortBy(_._1)
    assert(sorted.forall(r => r._5 >= 0 && r._5 < 512))
    assert(sorted.map(_._4).toSeq == sorted.map(_._4).toSeq.sorted)
  }
}
