package graft.ops

import graft.SparkSpec

class TextQueriesPlanSpec extends SparkSpec {

  test("text05 top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = TextQueries.queries("text05_top_tokens")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(
      physical.contains("TakeOrderedAndProject"),
      s"expected distributed top-k, got:\n$physical"
    )
    // no full-width global Sort above the aggregate
    assert(!physical.contains("Sort ["), s"unexpected global sort:\n$physical")
  }
}
