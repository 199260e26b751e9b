package graft.ops

import graft.SparkSpec

/** text16: integer-exact token-rarity scoring vs a driver-side brute
  * force over the same tokenization.
  */
class RaritySpec extends SparkSpec {

  test("rarity bits equal brute-force floor(log2(N/freq)) sums") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").map(t => (id, t))
    }
    val freq = all.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val n = all.length.toLong
    def bits(tok: String): Long =
      63 - java.lang.Long.numberOfLeadingZeros(n / freq(tok))
    val expected = all
      .groupBy(_._1)
      .map { case (id, ts) =>
        val s = ts.map(t => bits(t._2)).sum
        (id, ts.length.toLong, s, s.toDouble / ts.length)
      }
      .toSet
    val got = TextQueries
      .queries("text16_rarity")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
    // the frequency spread must be wide enough that bits actually vary
    assert(freq.values.max / freq.values.min >= 4,
      "fixture lacks frequency spread")
    assert(expected.map(_._4).toSeq.distinct.size > 1,
      "all docs scored identically")
  }
}
