package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cluster STRUCTURE mm17/mm18's gate cannot assert on its own
  * (the oracle proves engine parity, not intent): every planted
  * re-encode pairs with its original and nothing else, every
  * temporal decoy (reversed frames / rotated windows) stays a
  * singleton — the order-aware signature refuses content-equal,
  * order-wrong media — and no chance band collision survives
  * verification into a false merge.
  */
class MediaNearDupSpec extends SparkSpec {

  private def clusters(name: String) =
    graft.SparkEntry
      .queries(name)(spark, sfDir)
      .collect()
      .map(r =>
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
          r.getAs[Long]("survivor_id")))

  private def structure(
      name: String,
      mod: Long,
      rem: Long
  ): Unit = {
    val docs = graft.Tables(spark, sfDir).documents
      .filter(pmod(col("doc_id"), lit(mod)) === rem)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val decoys = docs.filter(_ % 2 == 1)
    val cs = clusters(name)
    // exactly one 2-member cluster per original (it + its re-encode),
    // one singleton per decoy — nothing merged across, nothing missed
    assert(cs.count(_._2 == 2L) === docs.size,
      s"$name: expected ${docs.size} planted pairs, " +
        s"got ${cs.count(_._2 == 2L)} two-member clusters")
    assert(cs.count(_._2 == 1L) === decoys.size,
      s"$name: temporal decoys must stay singletons")
    assert(cs.forall(_._2 <= 2L),
      s"$name: a chance collision merged unrelated media: " +
        cs.filter(_._2 > 2).mkString(","))
    // each pair's survivor is the ORIGINAL (the low id); each pair's
    // cluster label is the original's id too (min-label components)
    cs.filter(_._2 == 2L).foreach { case (cid, _, surv) =>
      assert(docs.contains(cid), s"$name: pair cluster $cid not an original")
      assert(surv === cid, s"$name: survivor $surv != original $cid")
    }
    cs.filter(_._2 == 1L).foreach { case (cid, _, _) =>
      assert(cid >= 2000000000L && decoys.contains(cid - 2000000000L),
        s"$name: unexpected singleton $cid")
    }
  }

  test("mm17: every re-encoded video joins its original; reversed decoys stay out") {
    structure("mm17_video_neardup", 17L, 9L)
  }

  test("mm18: every clipped re-encode joins its original; rotated decoys stay out") {
    structure("mm18_audio_neardup", 13L, 7L)
  }
}
