package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins both halves of the degree-ordered triangle form's contract:
  * (1) the enumeration is EXACTLY the raw canonical self-join's
  * output on a general graph (same oracle, only enumeration order
  * changes), and (2) on a hub graph — the input dedup17/19 exist to
  * diagnose — its wedge-candidate count stays linear where the raw
  * form's is quadratic.
  */
class TrianglesSpec extends SparkSpec {

  private def edgeDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
      .toDF("id_a", "id_b")
  }

  /** The raw middle-id wedge join dedup17 used before round 6. */
  private def rawTriangles(e: DataFrame): DataFrame =
    e.as("e1")
      .join(e.as("e2"), col("e1.id_b") === col("e2.id_a"))
      .join(
        e.as("e3"),
        col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b")
      )
      .select(
        col("e1.id_a").as("id_a"),
        col("e1.id_b").as("id_b"),
        col("e2.id_b").as("id_c")
      )

  private def collectTriples(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
      .sorted

  test("degree-ordered enumeration ≡ raw self-join ≡ brute force") {
    // deterministic pseudo-random graph: 30 nodes, ~90 edges — mixes
    // cliques, chains, and isolated fringe
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120) {
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
    }.filter { case (a, b) => a != b }
    val e = edgeDf(edges).localCheckpoint(true)

    val got = collectTriples(Triangles.triangles(Triangles.orient(e)))
    val raw = collectTriples(rawTriangles(e))
    assert(got === raw)

    // driver-side brute force over all node triples
    val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def conn(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val brute = for {
      a <- nodes; b <- nodes if b > a && conn(a, b)
      c <- nodes if c > b && conn(a, c) && conn(b, c)
    } yield (a, b, c)
    assert(got === brute.sorted)
    assert(got.nonEmpty, "fixture graph must actually contain triangles")
  }

  test("hub graph: oriented wedge candidates linear, raw quadratic") {
    // hub id 250 with its id in the MIDDLE of its 500 neighbors' ids —
    // the raw form's worst case (wedges center on the middle-id node)
    // — plus two leaf-leaf edges so the answer is non-empty
    val hub = 250L
    val spokes =
      (0L until 250L).map(i => (i, hub)) ++ (251L to 500L).map(j => (hub, j))
    val extra = Seq((1L, 2L), (300L, 301L))
    val e = edgeDf(spokes ++ extra).localCheckpoint(true)
    val m = e.count()

    // correctness on the hub fixture first: both closed triangles
    val o = Triangles.orient(e).localCheckpoint(true)
    val got = collectTriples(Triangles.triangles(o))
    assert(got === Seq((1L, 2L, 250L), (250L, 300L, 301L)))
    assert(got === collectTriples(rawTriangles(e)))

    // the scale claim: the hub (degree 502) is everyone's rank-max,
    // so it centers ZERO wedges — candidates stay below the edge
    // count, while the raw middle-id join enumerates ~250·250
    val orientedWedges = Triangles.wedges(o).count()
    assert(orientedWedges <= m, s"oriented wedges $orientedWedges > m=$m")
    val rawWedges = e.as("e1")
      .join(e.as("e2"), col("e1.id_b") === col("e2.id_a"))
      .count()
    assert(rawWedges >= 250L * 250L, s"raw wedges $rawWedges")
  }
}
