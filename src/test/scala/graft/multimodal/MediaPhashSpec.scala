package graft.multimodal

import graft.SparkSpec
import graft.dedup.Dedup
import graft.ops.PairJoins
import org.apache.spark.sql.functions._

/** mm05's dHash sketch: reference-model parity, locality (small edits
  * → small Hamming distance), separation on unrelated payloads, and
  * the banded pair-generation step on planted near-identical media.
  */
class MediaPhashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference dHash — the semantics Multimodal.dHash64 must match
    * (65 evenly spaced samples, bit i set iff s[p_i] < s[p_{i+1}]).
    */
  private def refHash(s: String): Long = {
    val L = s.length
    def at(i: Int): Int = s.charAt((i.toLong * (L - 1) / 64).toInt).toInt
    (0 until 64).foldLeft(0L) { (acc, i) =>
      if (at(i) < at(i + 1)) acc | (1L << i) else acc
    }
  }

  private def sparkHash(texts: Seq[String]): Map[String, Long] =
    texts
      .toDF("t")
      .select(col("t"), Multimodal.dHash64(col("t")).as("h"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carry quiet letters across a wide paper river " +
      "and the printer hums a flat warm tone under the desk lamp"

  test("expression matches the reference model (incl. bit 63 sign bit)") {
    // include a string engineered to set high bits: ascending tail
    val ascending = ('a' to 'z').mkString * 8
    val h = sparkHash(Seq(base, ascending, base.reverse))
    for (s <- Seq(base, ascending, base.reverse))
      assert(h(s) === refHash(s), s"mismatch for ${s.take(20)}…")
    assert(h(ascending) < 0L, "monotone samples must set bit 63")
  }

  test("locality: a one-character edit moves at most 4 bits") {
    val edited = base.updated(base.length / 2, 'Q')
    val h = sparkHash(Seq(base, edited))
    val d = java.lang.Long.bitCount(h(base) ^ h(edited))
    // one char is hit by at most 2 of the 65 samples; each sample
    // feeds 2 adjacent bits
    assert(d <= 4, s"hamming $d")
  }

  test("separation: unrelated payloads disagree on many bits") {
    val other =
      "zero one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
        "nineteen twenty twentyone twentytwo twentythree twentyfour"
    val h = sparkHash(Seq(base, other))
    assert(java.lang.Long.bitCount(h(base) ^ h(other)) > 8)
  }

  test("banded pair generation surfaces the planted near-identical pair") {
    // edit an UNSAMPLED position (the 65-sample grid reads ~1 in 3
    // chars at this length): the "re-encode" leaves the sketch within
    // a couple of bits, the usual dHash near-dup situation
    val sampled =
      (0 to 64).map(i => (i.toLong * (base.length - 1) / 64).toInt).toSet
    val idx = (0 until base.length).find(!sampled.contains(_)).get
    val twin = base.updated(idx, 'Z')
    val noise = (0 until 20).map(i => s"noise payload number $i " * 9)
    val media = ((Seq((0L, base), (1L, twin)) ++
      noise.zipWithIndex.map { case (t, i) => ((i + 2).toLong, t) }))
      .toDF("media_id", "t")
      .select(
        col("media_id"),
        Multimodal.dHash64(col("t")).as("phash")
      )
    val bands = media.select(
      struct(col("media_id"), col("phash")).as("m"),
      posexplode_outer(
        array((0 until 4).map(b =>
          shiftright(col("phash"), 16 * b).bitwiseAND(lit(65535L))
        ): _*)
      ).as(Seq("band", "key"))
    )
    val pairs = PairJoins
      .bucketedPairs(bands, Seq("band", "key"), "m")
      .select(
        col("id_a.media_id").as("id_a"),
        col("id_b.media_id").as("id_b"),
        Dedup.hamming(col("id_a.phash"), col("id_b.phash")).as("hamming")
      )
      .filter(col("hamming") <= 6)
      .collect()
    assert(
      pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      s"planted pair missing from ${pairs.mkString(",")}"
    )
  }
}
