package graft.sim

import graft.functions.PortableHash
import org.scalatest.funsuite.AnyFunSuite

class BloomAggregatorSpec extends AnyFunSuite {

  private def hs(n: Int, seed: String): Seq[Long] =
    (0 until n).map(i => PortableHash.h32Local(s"$seed:$i"))

  private def build(vs: Seq[Long]): Array[Long] =
    vs.foldLeft(BloomAggregator.sketch.zero)(BloomAggregator.sketch.reduce)

  test("no false negatives; merge equals single build") {
    val vs = hs(300, "in")
    val whole = build(vs)
    vs.foreach(v => assert(BloomAggregator.contains(whole, v)))
    val (l, r) = vs.splitAt(97)
    val merged = BloomAggregator.sketch.merge(build(l), build(r))
    assert(merged.toSeq === whole.toSeq)
  }

  test("false-positive rate near the analytic bound") {
    val in = hs(300, "in")
    val bits = build(in)
    val probes = hs(5000, "out").filterNot(in.toSet)
    val fp = probes.count(BloomAggregator.contains(bits, _)).toDouble /
      probes.size
    // (1 - e^(-K n / M))^K with K=3, n=300, M=4096 ≈ 0.8%; allow 4x
    assert(fp < 0.035, s"fp=$fp")
    assert(fp > 0.0, "no false positives at all is suspicious at n=300")
  }
}
