package graft.ops

import graft.SparkSpec

/** text11: Gopher-style repetition metrics, checked per-doc against an
  * in-test brute force over the same whitespace tokenization.
  */
class RepetitionSpec extends SparkSpec {

  test("text11 equals brute force repetition metrics") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val n = toks.size
      val dup = 1.0 - toks.distinct.size.toDouble / n
      val topBg =
        if (n >= 2)
          Some(
            toks
              .sliding(2)
              .map(_.mkString(" "))
              .toSeq
              .groupBy(identity)
              .values
              .map(_.size)
              .max
              .toDouble / (n - 1)
          )
        else None
      val flag = dup > 0.3 || topBg.getOrElse(0.0) > 0.18
      (id, n, dup, topBg, flag)
    }.toSet
    val got = graft.ops.TextQueries
      .queries("text11_repetition")(spark, sfDir)
      .collect()
      .map { r =>
        (
          r.getLong(0),
          r.getInt(2),
          r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)
        )
      }
      .toSet
    assert(got === expected)
  }
}
