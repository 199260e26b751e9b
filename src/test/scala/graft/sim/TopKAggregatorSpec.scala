package graft.sim

import graft.SparkSpec
import graft.sim.TopKAggregator.Scored

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k best with (score desc, id asc) tie-break") {
    val data = Seq(
      (1L, Scored(10L, 0.5)),
      (1L, Scored(11L, 0.9)),
      (1L, Scored(12L, 0.9)), // tie with 11 -> lower id wins ordering
      (1L, Scored(13L, 0.1)),
      (1L, Scored(14L, 0.7)),
      (2L, Scored(20L, 0.2))
    ).toDS()
    val out = data
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator.topK(3).toColumn.name("topk"))
      .collect()
      .toMap
    assert(out(1L).map(_.id) === Seq(11L, 12L, 14L))
    assert(out(2L).map(_.id) === Seq(20L))
  }

  test("merge across many partitions equals global sort") {
    val n = 500
    val data = (0 until n).map(i => (1L, Scored(i.toLong, (i * 37 % 101) / 100.0)))
    val out = data
      .toDS()
      .repartition(16)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator.topK(10).toColumn.name("topk"))
      .collect()
      .head
      ._2
    val expected = data
      .map(_._2)
      .sortBy(s => (-s.score, s.id))
      .take(10)
    assert(out.toSeq === expected)
  }
}
