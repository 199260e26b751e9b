package graft

import graft.functions.PortableHash

/** The sketch UDAFs are callable from plain SQL and agree with the
  * typed Aggregators they wrap.
  */
class SketchUdafSpec extends SparkSpec {

  test("graft_hll_distinct and graft_bloom resolve in spark.sql") {
    import spark.implicits._
    val hs = (0 until 1000).map(i => PortableHash.h32Local(s"v$i"))
    hs.toDF("h").createOrReplaceTempView("sketch_in")
    val est = spark
      .sql("SELECT graft_hll_distinct(h) AS est FROM sketch_in")
      .head()
      .getDouble(0)
    assert(est === sim.HllAggregator.estimate(
      hs.foldLeft(sim.HllAggregator.sketch.zero)(sim.HllAggregator.sketch.reduce)
    ))
    val bits = spark
      .sql("SELECT graft_bloom(h) AS bits FROM sketch_in")
      .head()
      .getSeq[Long](0)
      .toArray
    assert(sim.BloomAggregator.contains(bits, hs.head))
    assert(bits.toSeq === hs
      .foldLeft(sim.BloomAggregator.sketch.zero)(sim.BloomAggregator.sketch.reduce)
      .toSeq)
  }
}
