package graft.ops

import graft.SparkSpec

/** Spark 4.1 recursive CTE (`UnionLoop`) under the dedup26 shape:
  * level-guard termination on a CYCLIC graph and equality with a
  * driver-side BFS reference for both reach and path counts.
  */
class KHopRecursiveSpec extends SparkSpec {
  import spark.implicits._

  test("level-capped UNION ALL recursion terminates on a cycle and matches BFS") {
    // triangle + tail + isolated pair: cycles, branching, both
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (7L, 8L))
    val nodes = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L)
    val arcs = undirected ++ undirected.map { case (a, b) => (b, a) }
    arcs.toDF("id_a", "id_b").createOrReplaceTempView("khs_edges")
    nodes.toDF("doc_id").createOrReplaceTempView("khs_docs")
    val k = 3
    val got = spark
      .sql(s"""
        WITH RECURSIVE hop(id, start, lvl) AS (
          SELECT doc_id, doc_id, 0 FROM khs_docs
          UNION ALL
          SELECT e.id_b, h.start, h.lvl + 1
          FROM hop h JOIN khs_edges e ON e.id_a = h.id
          WHERE h.lvl < $k
        )
        SELECT start, CAST(COUNT(DISTINCT id) - 1 AS BIGINT) AS reach,
          CAST(COUNT(*) - 1 AS BIGINT) AS paths
        FROM hop GROUP BY start ORDER BY start
      """)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

    // reference: enumerate all ≤k-step walks
    val adj = arcs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = nodes.map { s =>
      var walks = Map(s -> 1L) // walks of current length ending at node
      var visited = Set(s)
      var paths = 0L
      for (_ <- 1 to k) {
        val next = walks.toSeq
          .flatMap { case (n, c) => adj.getOrElse(n, Nil).map(_ -> c) }
          .groupBy(_._1)
          .view
          .mapValues(_.map(_._2).sum)
          .toMap
        paths += next.values.sum
        visited ++= next.keys
        walks = next
      }
      (s, (visited - s).size.toLong, paths)
    }
    assert(got === expected)
  }
}
