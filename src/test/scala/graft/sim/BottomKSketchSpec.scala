package graft.sim

import graft.SparkSpec

class BottomKSketchSpec extends SparkSpec {
  import spark.implicits._

  private def naive(values: Seq[Long], k: Int): Seq[Long] =
    values.distinct.sorted.take(k)

  test("bottom-k is distinct, ascending, and equals the naive set form") {
    val data = Seq(9L, 3L, 9L, 7L, 3L, 1L, 8L, 1L, 5L).map((1L, _))
    val out = data
      .toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(BottomKSketch.bottomK(4).toColumn.name("sk"))
      .collect()
      .head
      ._2
    assert(out === Seq(1L, 3L, 5L, 7L))
    assert(out === naive(data.map(_._2), 4))
  }

  test("partitioning-invariant: any split/merge schedule gives the same sketch") {
    val values = (0 until 2000).map(i => (i * 2654435761L) % 100003L)
    val expected = naive(values, 64)
    for (parts <- Seq(1, 7, 32)) {
      val out = values
        .map((1L, _))
        .toDS()
        .repartition(parts)
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(BottomKSketch.bottomK(64).toColumn.name("sk"))
        .collect()
        .head
        ._2
      assert(out === expected, s"parts=$parts")
    }
  }

  test("groups smaller than k return their full distinct set") {
    val out = Seq((1L, 5L), (1L, 5L), (1L, 2L))
      .toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(BottomKSketch.bottomK(10).toColumn.name("sk"))
      .collect()
      .head
      ._2
    assert(out === Seq(2L, 5L))
  }

  test("sketch-union identity: bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B))") {
    val k = 32
    val a = (0 until 500).map(i => (i * 48271L) % 30011L)
    val b = (0 until 500).map(i => (i * 69621L) % 30011L)
    val direct = naive(a ++ b, k)
    val composed = naive(naive(a, k) ++ naive(b, k), k)
    assert(direct === composed)
  }

  test("KMV Jaccard estimate lands near the exact Jaccard") {
    val k = 128
    // KMV needs hash-uniform values: spread three disjoint element
    // ranges over 63-bit space with a Fibonacci mix, exact J = 1/3
    def mix(x: Long): Long = (x * 0x9E3779B97F4A7C15L) >>> 1
    val common = (0 until 1000).map(i => mix(i.toLong))
    val onlyA = (0 until 1000).map(i => mix(10000L + i))
    val onlyB = (0 until 1000).map(i => mix(20000L + i))
    val skA = naive(common ++ onlyA, k)
    val skB = naive(common ++ onlyB, k)
    val u = (skA ++ skB).distinct.sorted.take(k)
    val est = u.count(h => skA.contains(h) && skB.contains(h)).toDouble / u.size
    val setA = (common ++ onlyA).distinct.toSet
    val setB = (common ++ onlyB).distinct.toSet
    val exact =
      setA.intersect(setB).size.toDouble / setA.union(setB).size
    assert(math.abs(est - exact) < 3.0 / math.sqrt(k), s"est=$est exact=$exact")
  }
}
