package graft.ops

import graft.SparkSpec

/** text14: sliding-window chunking with overlap, checked against a
  * driver-side brute force over the same whitespace tokenization.
  */
class ChunkOverlapSpec extends SparkSpec {

  private val T = 128
  private val S = 96

  test("text14 equals brute-force sliding chunks") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (id, text) <- docs.toSeq
      toks = text.trim.split("\\s+")
      if toks.nonEmpty
      i <- 0 to (toks.length - 1) / S
      start = i * S
      end = math.min(start + T, toks.length)
    } yield (id, i.toLong, start.toLong, end.toLong,
      toks.slice(start, end).mkString(" "))).toSet
    assert(expected.nonEmpty)
    val got = TextQueries
      .queries("text14_chunk_overlap")(spark, sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))
      )
      .toSet
    assert(got === expected)
  }

  test("text14 adjacent chunks overlap by T - S tokens") {
    val rows = TextQueries
      .queries("text14_chunk_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    // some doc must produce >1 chunk or the overlap path is untested
    assert(byDoc.values.exists(_.length > 1), "no multi-chunk docs")
    byDoc.values.foreach { chunks =>
      // overlap = endA - startB: exactly T-S for full chunks, in
      // (0, T-S] when the earlier chunk was truncated by doc end
      chunks.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, _, endA), (_, _, startB, _)) =>
          val overlap = endA - startB
          assert(overlap > 0 && overlap <= (T - S).toLong)
        case _ => ()
      }
    }
  }
}
