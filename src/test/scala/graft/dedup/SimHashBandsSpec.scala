package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dedup07: Hamming-band candidate generation semantics, checked
  * end-to-end against an in-test brute force over the same sketches.
  */
class SimHashBandsSpec extends SparkSpec {

  private def sketches: Map[Long, Long] =
    graft.Tables(spark, sfDir)
      .documents
      .select(
        col("doc_id"),
        graft.plans.SimHash32(spark, col("text")).as("sh")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  private def bands(sh: Long): Set[(Int, Long)] =
    (0 until 4).map(b => b -> ((sh >> (8 * b)) & 255L)).toSet

  test("dedup07 equals brute force: shares-a-band AND hamming <= 8") {
    val sk = sketches
    val ids = sk.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if (bands(sk(a)) intersect bands(sk(b))).nonEmpty
      h = java.lang.Long.bitCount(sk(a) ^ sk(b))
      if h <= 8
    } yield (a, b, h.toLong)).toSet
    val got = graft.ops.DedupQueries
      .queries("dedup07_simhash_bands")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .toSet
    assert(got === expected)
  }

  test("pigeonhole recall: every pair at hamming <= 3 is a candidate") {
    val sk = sketches
    val ids = sk.keys.toSeq.sorted
    val close = for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(sk(a) ^ sk(b)) <= 3
    } yield (a, b)
    // 4 disjoint 8-bit bands: <=3 differing bits can touch at most 3
    // bands, so one band must agree — the candidate set cannot miss
    close.foreach { case (a, b) =>
      assert(
        (bands(sk(a)) intersect bands(sk(b))).nonEmpty,
        s"pair ($a,$b) at hamming<=3 missing from band candidates"
      )
    }
  }
}
