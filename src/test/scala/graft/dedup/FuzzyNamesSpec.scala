package graft.dedup

import graft.SparkSpec

/** dedup09: blocked fuzzy entity resolution — candidates share the
  * (brand, first name token) blocking key, matches are bounded edit
  * distance <= 3. Checked end-to-end against an in-test brute force.
  */
class FuzzyNamesSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      )
    d(a.length)(b.length)
  }

  test("dedup09 equals brute force over the blocking key") {
    val parts = graft
      .Tables(spark, sfDir)
      .part
      .select("p_partkey", "p_brand", "p_name")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = (for {
      (ka, ba, na) <- parts
      (kb, bb, nb) <- parts
      if ka < kb && ba == bb && na.split(" ")(0) == nb.split(" ")(0)
      d = lev(na, nb)
      if d <= 3
    } yield (ka, kb, d)).toSet
    assert(expected.nonEmpty, "fixture produced no fuzzy matches")
    val got = graft.ops.DedupQueries
      .queries("dedup09_fuzzy_names")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got === expected)
  }
}
