package graft.dedup

import graft.SparkSpec

/** dedup12: asymmetric shingle containment, checked against a
  * driver-side brute force over the same sketch (df-banded inverted
  * index vs direct set intersection — the DuckDB oracle is the
  * cross-engine reconstruction).
  */
class ContainmentSpec extends SparkSpec {

  private val maxDf = 20
  private val tau = 0.5

  test("dedup12 equals brute-force containment over df-capped shingles") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = docs.map { case (id, text) =>
      id -> graft.plans.ShingleHashes.compute(text).toSet
    }.toMap
    val df = sets.values.flatten
      .groupBy(identity)
      .map { case (h, hs) => h -> hs.size }
    val capped = sets.map { case (id, sh) =>
      id -> sh.filter(h => df(h) >= 2 && df(h) <= maxDf)
    }
    val expected = (for {
      (a, sa) <- capped.toSeq if sa.nonEmpty
      (b, sb) <- capped.toSeq if a != b
      common = sa.intersect(sb).size
      if common.toDouble / sa.size >= tau
    } yield (a, b, sa.size.toLong, common.toLong,
      common.toDouble / sa.size)).toSet
    assert(expected.nonEmpty, "fixture has no containment pairs")
    val got = graft.ops.DedupQueries
      .queries("dedup12_containment")(spark, sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))
      )
      .toSet
    assert(got === expected)
  }

  test("dedup12 containment is genuinely asymmetric on the fixture") {
    val got = graft.ops.DedupQueries
      .queries("dedup12_containment")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4)))
      .toMap
    // the metric must be direction-sensitive somewhere: either a pair
    // survives in only one direction, or the two directions score
    // differently (denominator = the A side's set size, not the union)
    assert(got.exists { case ((a, b), c) =>
      got.get((b, a)).forall(_ != c) || !got.contains((b, a))
    })
  }
}
