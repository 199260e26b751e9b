package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Shuffle budgets for the round-5 operators: each query's physical
  * plan may not exceed the Exchange count its design promises — a
  * regression that re-introduces a recompute or an extra shuffle
  * fails here, not in a benchmark diff three rounds later. Counts are
  * UPPER bounds on the pre-AQE plan (runtime exchange reuse only
  * lowers the real number).
  */
class PlanBudgetSpec extends SparkSpec {

  private def exchanges(df: DataFrame): (Int, Int) = {
    val plan = df.queryExecution.executedPlan
    var shuffle = 0
    var bcast = 0
    plan.foreach {
      case _: ShuffleExchangeLike   => shuffle += 1
      case _: BroadcastExchangeLike => bcast += 1
      case _                        => ()
    }
    (shuffle, bcast)
  }

  private def run(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("text14 chunking shuffles only for the presentation sort") {
    val (s, _) = exchanges(run("text14_chunk_overlap"))
    assert(s <= 1, s"text14 shuffles=$s")
  }

  test("q59 mixture explode shuffles only for the presentation sort") {
    val (s, _) = exchanges(run("q59_mixture_epochs"))
    assert(s <= 1, s"q59 shuffles=$s")
  }

  test("q58 shuffle-shard pays one window partition plus the sort") {
    val (s, _) = exchanges(run("q58_corpus_shuffle"))
    assert(s <= 2, s"q58 shuffles=$s")
  }

  test("cdc08 retract aggregation: key window + group agg + sort") {
    val (s, _) = exchanges(run("cdc08_agg_maintain"))
    assert(s <= 3, s"cdc08 shuffles=$s")
  }

  test("dedup14 bloom probe side adds NO shuffle beyond the sort") {
    val (s, _) = exchanges(run("dedup14_bloom_decontaminate"))
    // probe plan only (the filter build ran at plan-construction time
    // through its own aggregate): repartition is inherited from
    // docs(); the probe itself is map-side
    assert(s <= 2, s"dedup14 shuffles=$s")
  }

  test("dedup12 single-pass posting lists: index agg + pair agg + sizes agg + join + sort") {
    val (s, _) = exchanges(run("dedup12_containment"))
    assert(s <= 7, s"dedup12 shuffles=$s")
  }

  test("q62 histogram: one hash agg plus the presentation sort") {
    val (s, _) = exchanges(run("q62_histogram"))
    assert(s <= 2, s"q62 shuffles=$s")
  }

  test("q63 regression: one moments agg plus the presentation sort") {
    val (s, _) = exchanges(run("q63_regression"))
    assert(s <= 2, s"q63 shuffles=$s")
  }

  test("q64 funnel: three stage aggs + stage joins, nothing rescans") {
    val (s, _) = exchanges(run("q64_funnel"))
    assert(s <= 8, s"q64 shuffles=$s")
  }

  test("q65 retention: first-event agg + join + cell distinct/agg") {
    val (s, _) = exchanges(run("q65_retention"))
    assert(s <= 4, s"q65 shuffles=$s")
  }

  test("text17 pack spans: the two prefix-scan levels + span agg + sort") {
    val (s, _) = exchanges(run("text17_pack_spans"))
    assert(s <= 5, s"text17 shuffles=$s")
  }

  test("sim14 kNN vote: one query_id window partition, vote agg reuses it") {
    val (s, _) = exchanges(run("sim14_label_knn"))
    assert(s <= 2, s"sim14 shuffles=$s")
  }

  test("dedup16 cross-source: dedup04 discipline + two source joins + cell agg") {
    val (s, _) = exchanges(run("dedup16_cross_source"))
    assert(s <= 9, s"dedup16 shuffles=$s")
  }

  test("q66 deep star join: no nested loop, date slice reaches the scan") {
    val df = run("q66_local_supplier")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
    assert(
      plan.contains("GreaterThanOrEqual(o_orderdate"),
      "date filter not pushed to the orders scan"
    )
  }

  test("text18 heaps curve: two vocab-keyed aggs + slice aggs + join") {
    val (s, _) = exchanges(run("text18_heaps"))
    assert(s <= 5, s"text18 shuffles=$s")
  }

  test("dedup17 triangle legs reuse one MinHash pipeline (ReusedExchange)") {
    val df = run("dedup17_triangles")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"no exchange reuse across triangle legs:\n$plan"
    )
  }
}
