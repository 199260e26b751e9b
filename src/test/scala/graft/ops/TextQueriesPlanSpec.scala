package graft.ops

import graft.SparkSpec

class TextQueriesPlanSpec extends SparkSpec {

  test("text01/02/03 tokenize once: exactly one split per plan") {
    Seq("text01_token_stats", "text02_quality", "text03_langid").foreach { q =>
      val physical =
        TextQueries.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      val n = "split\\(trim\\(".r.findAllIn(physical).size
      assert(
        n == 1,
        s"$q: expected the staged single tokenizer evaluation, got $n:\n$physical"
      )
    }
  }

  test("text10 prefix scan: corpus window is bucket-partitioned, never global") {
    val physical = TextQueries
      .queries("text10_pack")(spark, sfDir)
      .queryExecution
      .executedPlan
      .toString
    // the full-corpus running sum must be keyed by the derived bucket
    // (a partition-less window over the corpus is a single-reducer
    // bottleneck; only the tiny bucket-totals table may use one)
    assert(physical.contains("windowspecdefinition(__bucket"), physical)
  }

  test("pipe01 tokenizes once and carries filters into one plan") {
    val physical = TextQueries
      .queries("pipe01_corpus")(spark, sfDir)
      .queryExecution
      .executedPlan
      .toString
    val n = "split\\(trim\\(".r.findAllIn(physical).size
    assert(n == 1, s"expected one staged tokenizer, got $n:\n$physical")
  }

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
