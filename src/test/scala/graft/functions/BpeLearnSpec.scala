package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Distributed BPE learning must equal the sequential reference
  * algorithm exactly: same merge table (order included), same final
  * tokenization, on both a hand-built corpus with known merges/ties
  * and a fixture slice.
  */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: count adjacent pairs over all docs, merge
    * the (count desc, pair asc) argmax greedily left-to-right,
    * repeat. */
  private def referenceLearn(
      docs: Seq[Vector[String]],
      k: Int
  ): (Seq[(String, String)], Seq[Vector[String]]) = {
    var cur = docs
    val merges = Seq.newBuilder[(String, String)]
    (0 until k).foreach { _ =>
      val counts = mutable.Map.empty[(String, String), Long]
      cur.foreach { toks =>
        toks.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
          case _         =>
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b))
        cur = cur.map { toks =>
          val out = Vector.newBuilder[String]
          var last: Option[String] = None
          toks.foreach { t =>
            if (last.contains(a) && t == b) {
              val merged = BpeLearn.mergedToken(a, b)
              // replace the pending `a` with the merged token
              last = Some(merged)
            } else {
              last.foreach(out += _)
              last = Some(t)
            }
          }
          last.foreach(out += _)
          out.result()
        }
      }
    }
    (merges.result(), cur)
  }

  private def distributedLearn(
      docs: Seq[(Long, Vector[String])],
      k: Int
  ): (Seq[(String, String)], Map[Long, Vector[String]]) = {
    val df = docs.toDF("doc_id", "toks")
    val (merges, fin) = BpeLearn.learn(df, "toks", k)
    val out = fin
      .select(col("doc_id"), col("toks"))
      .as[(Long, Seq[String])]
      .collect()
      .map { case (id, t) => id -> t.toVector }
      .toMap
    (merges, out)
  }

  test("hand corpus: known merges, ties broken lexicographically, greedy non-overlap") {
    // "a a a" exercises greedy non-overlap; (x y) vs (y x) tie breaks on a-asc
    val docs = Seq(
      1L -> Vector("a", "a", "a"),
      2L -> Vector("x", "y", "x", "y"),
      3L -> Vector("x", "y", "z")
    )
    val (merges, fin) = distributedLearn(docs, 2)
    val (refMerges, refFin) = referenceLearn(docs.map(_._2), 2)
    assert(merges === refMerges)
    assert(docs.map(_._1).map(fin) === refFin)
    // first merge must be the lexicographically-least of the 3-count
    // candidates — ("x","y") appears 3 times, ("a","a") only twice
    // (greedy non-overlap: [a a a] has 2 adjacent pairs but one merge)
    assert(merges.head === (("x", "y")))
    assert(fin(1L) === Vector("a a", "a"))
  }

  test("fixture slice: distributed learn equals the sequential reference") {
    val raw = Tables(spark, sfDir).documents
      .filter(col("doc_id") < 30L)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])]
      .collect()
      .map { case (id, t) => id -> t.toVector }
      .toSeq
      .sortBy(_._1)
    assert(raw.nonEmpty)
    val k = 5
    val (merges, fin) = distributedLearn(raw, k)
    val (refMerges, refFin) = referenceLearn(raw.map(_._2), k)
    assert(merges === refMerges)
    assert(merges.length === k)
    assert(raw.map(_._1).map(fin) === refFin)
    // merges actually fire: total token count strictly drops
    assert(fin.values.map(_.size).sum < raw.map(_._2.size).sum)
  }
}
