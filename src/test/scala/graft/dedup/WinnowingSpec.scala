package graft.dedup

import graft.SparkSpec
import graft.functions.PortableHash
import graft.ops.DedupQueries3

/** dedup30's winnow selection vs an independent sequential
  * reimplementation, plus the published detection guarantee
  * (Schleimer et al. 2003): docs sharing a token run of at least
  * W + GRAM − 1 tokens share at least one winnowed fingerprint.
  */
class WinnowingSpec extends SparkSpec {

  private val GRAM = 3
  private val W = 4
  private val POS_CAP = 1L << 20

  /** Sequential robust winnowing over a raw text — independent of the
    * dataframe formulation (explicit loop, same normalize/hash).
    */
  private def reference(text: String): Set[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < GRAM) return Set.empty
    val hs = (0 to toks.size - GRAM)
      .map(p => PortableHash.h32Local(toks.slice(p, p + GRAM).mkString(" ")))
    val starts = 0 to math.max(hs.size - W, 0)
    starts.map { p =>
      val win = hs.slice(p, math.min(p + W, hs.size))
      // rightmost min: smallest hash, largest position on ties
      win.zipWithIndex.minBy { case (h, i) => h * POS_CAP + (POS_CAP - 1 - (p + i)) }._1
    }.toSet
  }

  test("dataframe winnow selection equals the sequential reference on the fixture") {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "text")
    val got = DedupQueries3
      .winnowedFingerprints(docs)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val want = reference(text)
      assert(
        got.getOrElse(id, Set.empty) === want,
        s"doc $id winnowed set diverges from sequential winnowing"
      )
    }
  }

  test("guarantee: a shared W+GRAM-1 token run yields a shared fingerprint") {
    import spark.implicits._
    val run = (1 to (W + GRAM - 1)).map(i => s"shared$i").mkString(" ")
    // the run is embedded at different offsets amid disjoint noise —
    // position-robustness is the point of winnowing vs fixed striding
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"$run zeta eta theta iota kappa lambda mu nu xi")
    ).toDF("doc_id", "text")
    val fp = DedupQueries3
      .winnowedFingerprints(docs)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    assert(
      (fp(1L) intersect fp(2L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint for a shared run"
    )
  }

  test("density: fingerprints per doc are sub-linear in gram count") {
    val docs = graft.Tables(spark, sfDir).documents.select("doc_id", "text")
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp = DedupQueries3
      .winnowedFingerprints(docs)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.length)
      .toMap
    val (tot, sel) = texts.foldLeft((0, 0)) { case ((t, s), (id, text)) =>
      val ng = math.max(text.trim.split("\\s+").length - GRAM + 1, 0)
      (t + ng, s + fp.getOrElse(id, 0))
    }
    assert(tot > 0)
    // winnowing's expected density is 2/(W+1) of gram positions;
    // distinct-hash dedup only shrinks it further. Allow slack above
    // for the fixture's tiny vocabulary (repeated grams collide).
    assert(sel < tot, "winnowing selected every gram — no compression")
    assert(sel.toDouble / tot < 3.0 / (W + 1), s"density $sel/$tot above ~2/(W+1)")
  }
}
