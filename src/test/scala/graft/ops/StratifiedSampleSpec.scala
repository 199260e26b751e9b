package graft.ops

import graft.SparkSpec
import graft.functions.PortableHash

/** q55: per-source hash-ordered quota sampling — values against an
  * in-test brute force, and the rank-limit pushdown (WindowGroupLimit)
  * asserted so the per-stratum top-k never degenerates into a full
  * stratum sort.
  */
class StratifiedSampleSpec extends SparkSpec {

  test("q55 equals brute force per-source top-20 by portable hash") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("source", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.toSeq
      .groupBy(_._1)
      .flatMap { case (src, rows) =>
        rows
          .map { case (_, id) => (PortableHash.h32Local(id.toString), id) }
          .sortBy(identity)
          .take(20)
          .zipWithIndex
          .map { case ((_, id), i) => (src, id, i + 1) }
      }
      .toSet
    val got = graft.ops.MiscQueries
      .queries("q55_stratified_sample")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got === expected)
  }

  test("rank filter is pushed into WindowGroupLimit") {
    val df =
      graft.ops.MiscQueries.queries("q55_stratified_sample")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan"
    )
  }
}
