package graft.sim

import graft.functions.PortableHash
import org.scalatest.funsuite.AnyFunSuite

/** HLL register/estimate math, driver-side (the cross-engine check is
  * the q57 oracle, which reconstructs registers AND estimate in SQL).
  */
class HllAggregatorSpec extends AnyFunSuite {

  private def hashes(n: Int, seed: String): Seq[Long] =
    (0 until n).map(i => PortableHash.h32Local(s"$seed:$i"))

  private def sketchOf(hs: Seq[Long]): Array[Byte] =
    hs.foldLeft(HllAggregator.sketch.zero)(HllAggregator.sketch.reduce)

  test("merge of split sketches equals single-pass sketch") {
    val hs = hashes(5000, "u")
    val whole = sketchOf(hs)
    val (l, r) = hs.splitAt(1234)
    val merged = HllAggregator.sketch.merge(sketchOf(l), sketchOf(r))
    assert(merged.toSeq === whole.toSeq)
  }

  test("merge is commutative and idempotent") {
    val a = sketchOf(hashes(400, "a"))
    val b = sketchOf(hashes(400, "b"))
    val ab = HllAggregator.sketch.merge(a.clone(), b.clone())
    val ba = HllAggregator.sketch.merge(b.clone(), a.clone())
    assert(ab.toSeq === ba.toSeq)
    val aa = HllAggregator.sketch.merge(a.clone(), a.clone())
    assert(aa.toSeq === a.toSeq)
  }

  test("estimate lands within the published error band") {
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    for (n <- Seq(500, 2000, 10000)) {
      val est = HllAggregator.estimate(sketchOf(hashes(n, s"n$n")))
      assert(math.abs(est - n) / n < 0.39, s"n=$n est=$est")
    }
  }

  test("rho matches the SQL bit-trick formula") {
    for (w <- Seq(0L, 1L, 2L, 3L, 96L, 1L << 25)) {
      val viaBits =
        if (w == 0L) HllAggregator.RHO_CAP
        else java.lang.Long.bitCount((w & -w) - 1) + 1
      assert(HllAggregator.rho(w) === viaBits, s"w=$w")
    }
  }
}
