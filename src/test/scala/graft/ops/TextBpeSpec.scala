package graft.ops

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** text38 checked against a sequential single-node BPE reference: the
  * distributed pair-count → argmax → greedy-rewrite loop must produce
  * the exact merge table (including tie-breaks and the post-merge
  * corpus token counts) that the textbook in-memory algorithm does.
  */
class TextBpeSpec extends SparkSpec {

  /** The fold's greedy left-to-right merge, in its imperative form. */
  private def rewrite(
      syms: Vector[String],
      l: String,
      r: String,
      m: String
  ): Vector[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = m
      else out += x
    }
    out.toVector
  }

  test("text38: merge table matches the sequential BPE reference") {
    val wordCounts = graft
      .Tables(spark, sfDir)
      .documents
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(
        length(col("w")) > 0 &&
          length(col("w")) <= TextQueries3.BPE_MAX_WORD
      )
      .groupBy("w")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.split("").toVector -> c }
    val expected = (1 to TextQueries3.BPE_MERGES).map { round =>
      val pairs = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        pairs(k) = pairs.getOrElse(k, 0L) + c
      }
      val ((bl, br), bc) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      val merged = bl + br
      words = words
        .groupMapReduce { case (syms, _) => rewrite(syms, bl, br, merged) }(
          _._2
        )(_ + _)
      val corpusTokens = words.map { case (s, c) => s.length * c }.sum
      (round.toLong, bl, br, merged, bc, corpusTokens)
    }

    val got = TextQueries3
      .queries("text38_bpe_merges")(spark, sfDir)
      .collect()
      .map { r =>
        (
          r.getLong(0),
          r.getString(1),
          r.getString(2),
          r.getString(3),
          r.getLong(4),
          r.getLong(5)
        )
      }
      .toSeq
    assert(got === expected)
    // compression curve: every merge strictly shrinks the corpus
    val curve = got.map(_._6)
    assert(curve.zip(curve.tail).forall { case (a, b) => b < a })
  }

  test("text40: batched learner ≡ sequential at k=12, in fewer rounds") {
    // sequential reference, extended past the gated BPE_MERGES so the
    // equivalence is exercised across several batch boundaries
    val k = 12
    val wordCounts = graft
      .Tables(spark, sfDir)
      .documents
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(
        length(col("w")) > 0 &&
          length(col("w")) <= TextQueries3.BPE_MAX_WORD
      )
      .groupBy("w")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.split("").toVector -> c }
    val expected = (1 to k).map { _ =>
      val pairs = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1) {
        val key = (syms(j), syms(j + 1))
        pairs(key) = pairs.getOrElse(key, 0L) + c
      }
      val ((bl, br), bc) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      words = words
        .groupMapReduce { case (syms, _) => rewrite(syms, bl, br, bl + br) }(
          _._2
        )(_ + _)
      (bl, br, bc)
    }

    val (got, fin, rounds) =
      TextQueries3.bpeBatchedLearn(spark, sfDir, k, TextQueries3.BPE_BATCH)
    org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(fin)
    assert(got.map(m => (m._2, m._3, m._4)) === expected)
    // the whole point: strictly fewer corpus passes than merges (the
    // fixture runs 12 merges in 7 rounds; allow drift headroom)
    assert(rounds < k, s"batching bought nothing: $rounds rounds for $k")
    assert(rounds <= 9, s"round compression regressed: $rounds rounds")
    // batch rounds are non-decreasing and start at 1
    val rs = got.map(_._1)
    assert(rs.head === 1 && rs.zip(rs.tail).forall { case (a, b) => b >= a })
  }

  test("text39: encode totals tie out to the corpus and to text38's curve") {
    val enc = TextQueries3
      .queries("text39_bpe_encode")(spark, sfDir)
      .collect()
    val merges = TextQueries3
      .queries("text38_bpe_merges")(spark, sfDir)
      .collect()
    val corpusTokensAfterAll =
      merges.maxBy(_.getLong(0)).getAs[Long]("corpus_tokens_after")
    // Σ-lang BPE tokens must equal the corpus symbol count after the
    // final merge — encode and learn agree on what the corpus costs
    assert(enc.map(_.getAs[Long]("n_bpe_tokens")).sum === corpusTokensAfterAll)
    // Σ-lang word occurrences = the raw whitespace token count
    val rawTokens = graft
      .Tables(spark, sfDir)
      .documents
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(
        length(col("w")) > 0 &&
          length(col("w")) <= TextQueries3.BPE_MAX_WORD
      )
      .count()
    assert(enc.map(_.getAs[Long]("n_words")).sum === rawTokens)
    // merging never splits: every language compresses (>= 1 piece/word,
    // strictly fewer pieces than characters once any merge applies)
    enc.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_bpe_tokens") <= r.getAs[Long]("n_chars"))
    }
  }
}
