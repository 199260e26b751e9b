package graft.dedup

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("pointer jumping: a 40-node chain converges within ~log2(n) rounds") {
    // plain min-propagation needs diameter (39) rounds and would hit
    // the cap; the jump halves remaining distance every round
    val nodes = (0L until 40L).toDF("id")
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Clusters
      .connectedComponents(nodes, edges, maxIters = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L until 40L).toSet)
  }

  test("checkpoint blocks are released: at most one persisted RDD survives a call") {
    // the iterative loop localCheckpoints sym + one table per round;
    // all but the FINAL label table (which the returned DataFrame
    // reads lazily) must be unpersisted before return — a bench
    // session running this 4× otherwise strands ~10 block sets per
    // execution in storage memory (round-3 verdict item 3)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Clusters.connectedComponents(nodes, edges, maxIters = 10)
    assert(out.count() === 64L)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(
      leaked.size <= 1,
      s"expected <=1 surviving checkpoint (final labels), got ${leaked.size}"
    )
  }

  test("star contraction: a 10k-node chain converges (diameter-independent)") {
    // the propagation variant with default maxIters would need
    // log2-rounds too, but star contraction rewrites the EDGE set —
    // this pins the O(log n) convergence on the worst-case topology
    val n = 10000L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Clusters
      .connectedComponentsStars(nodes, edges, maxIters = 20)
      .agg(
        org.apache.spark.sql.functions.countDistinct("cluster_id"),
        org.apache.spark.sql.functions.count("id"),
        org.apache.spark.sql.functions.max("cluster_id")
      )
      .collect()
      .head
    assert(got.getLong(0) === 1L)
    assert(got.getLong(1) === n)
    assert(got.getLong(2) === 0L)
  }

  test("property: star contraction equals union-find components") {
    val n = 30
    val genEdges = Gen.listOfN(
      25,
      for {
        a <- Gen.choose(0L, (n - 1).toLong)
        b <- Gen.choose(0L, (n - 1).toLong) if a != b
      } yield (math.min(a, b), math.max(a, b))
    )
    val prop = Prop.forAll(genEdges) { edges =>
      val nodes = (0L until n.toLong).toDF("id")
      val edf = edges.toDF("id_a", "id_b")
      val got = Clusters
        .connectedComponentsStars(nodes, edf)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      got == unionFind(n, edges)
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: label propagation equals union-find components") {
    val n = 30
    val genEdges = Gen.listOfN(
      25,
      for {
        a <- Gen.choose(0L, (n - 1).toLong)
        b <- Gen.choose(0L, (n - 1).toLong) if a != b
      } yield (math.min(a, b), math.max(a, b))
    )
    val prop = Prop.forAll(genEdges) { edges =>
      val nodes = (0L until n.toLong).toDF("id")
      val edf = edges.toDF("id_a", "id_b")
      val got = Clusters
        .connectedComponents(nodes, edf)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      got == unionFind(n, edges)
    }
    val res =
      SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
