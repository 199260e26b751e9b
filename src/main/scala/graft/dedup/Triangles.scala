package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hub-safe triangle enumeration: the degree-ordered node-iterator
  * form (compact-forward / "rank orientation") of triangle counting.
  *
  * The raw canonical self-join (`e1.id_b = e2.id_a`) centers every
  * wedge on the MIDDLE-id node, so a degree-d hub whose id falls
  * between its neighbors' ids enumerates Θ(d²) wedge candidates —
  * and the near-dup graph queries exist precisely to DIAGNOSE hubs
  * (boilerplate shingles, hot LSH buckets), so the enumerate-first
  * form blows up on exactly the inputs where its answer matters.
  *
  * Here each undirected edge is oriented toward its HIGHER-rank
  * endpoint, rank = (degree, id): hubs are rank-maxima, so all their
  * edges point INTO them and they center zero wedges. Per-node
  * out-degree is bounded by O(√m) (more precisely the graph's
  * degeneracy), so the wedge candidate count is Σ outdeg² ≤ O(m^1.5)
  * for ANY graph — arboricity-bounded instead of degree²-bounded
  * (Chiba–Nishizeki; the standard distributed form, cf. Suri &
  * Vassilvitskii, WWW'11). Each triangle {a,b,c} is found exactly
  * once: orientation makes the triangle an acyclic tournament
  * r1→r2→r3, the unique out-degree-2 corner r1 centers the one wedge
  * (r2, r3), and the closing edge r2→r3 is oriented low→high rank by
  * construction, so one equi-semi-join closes it.
  *
  * Output is identical to the raw form — only the enumeration order
  * changes — so dedup17/19 keep their sequential-SQL oracles
  * unchanged. TrianglesSpec pins both halves: result ≡ the raw
  * self-join on a general fixture, and wedge candidates stay linear
  * on a hub graph where the raw form is quadratic.
  */
object Triangles {

  /** Per-node degree of a canonical (id_a < id_b) edge list. */
  private[graft] def degrees(e: DataFrame): DataFrame =
    e.select(col("id_a").as("node"))
      .unionByName(e.select(col("id_b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))

  /** Orient every edge toward its higher-rank endpoint. Returns
    * (src, dst, __rdst) with rank(src) < rank(dst); `__rdst` is the
    * destination's (deg, id) rank struct, carried so the wedge join
    * can order a node's out-neighborhood without re-joining degrees.
    * Ranks are strict (ids are distinct), so the orientation is total.
    */
  private[graft] def orient(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    // field names are aliased identically so the two rank structs are
    // the same TYPE (CASE branches must agree)
    val rankA = struct(col("__da").as("d"), col("id_a").as("i"))
    val rankB = struct(col("__db").as("d"), col("id_b").as("i"))
    e.join(deg.select(col("node").as("id_a"), col("deg").as("__da")), "id_a")
      .join(deg.select(col("node").as("id_b"), col("deg").as("__db")), "id_b")
      .select(
        when(rankA < rankB, col("id_a")).otherwise(col("id_b")).as("src"),
        when(rankA < rankB, col("id_b")).otherwise(col("id_a")).as("dst"),
        when(rankA < rankB, rankB).otherwise(rankA).as("__rdst")
      )
  }

  /** Ordered out-wedges (u, v, w): v, w both out-neighbors of u with
    * rank(v) < rank(w) — each unordered out-pair once. This is the
    * candidate set whose size the orientation bounds.
    */
  private[graft] def wedges(o: DataFrame): DataFrame =
    o.as("o1")
      .join(
        o.as("o2"),
        col("o1.src") === col("o2.src") &&
          col("o1.__rdst") < col("o2.__rdst")
      )
      .select(
        col("o1.src").as("u"),
        col("o1.dst").as("v"),
        col("o2.dst").as("w")
      )

  /** Canonical triangle list (id_a < id_b < id_c), one row per
    * triangle, from an ORIENTED edge list (checkpoint `o` first — it
    * is consumed three times: two wedge legs and the closing side).
    */
  def triangles(o: DataFrame): DataFrame =
    wedges(o)
      .join(
        o.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"),
        "left_semi"
      )
      .select(array_sort(array(col("u"), col("v"), col("w"))).as("__t"))
      .select(
        element_at(col("__t"), 1).as("id_a"),
        element_at(col("__t"), 2).as("id_b"),
        element_at(col("__t"), 3).as("id_c")
      )
}
