package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** Connected components over a near-duplicate pair graph — the
  * clustering step between pair detection and canonical-document
  * selection ("of these k mutually-similar docs, keep one").
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of
  * its label and its neighbors' labels; fixpoint = per-component min
  * id. Deterministic by construction (min is order-independent), so
  * the result is oracle-comparable against a recursive-CTE
  * reachability mirror.
  *
  * Scale posture: each round is three dense-key shuffles
  * (neighbor-min groupBy + label join + pointer-jump join), and the
  * pointer-jump halves every node's remaining distance to its
  * component min, so rounds needed = O(log diameter) — long chains
  * converge in ~log₂(n) rounds, dup-cluster cliques in 1-2. The loop
  * runs only over edge-incident nodes (singletons rejoin at the
  * end). Lineage is cut per round with an eager `localCheckpoint`
  * (iterative self-joins otherwise stack an exponential plan), and
  * every superseded round's checkpoint blocks are released as soon
  * as the successor is materialized — a long-lived session otherwise
  * strands O(rounds) block sets in executor storage per call. Only
  * the final label table stays persisted (the returned DataFrame
  * reads it lazily); the convergence probe is one scalar count per
  * round, never a per-row driver loop; non-convergence at maxIters
  * throws.
  */
object Clusters {

  /** @param nodes one column `id` (every node, incl. singletons)
    * @param edges columns `id_a`, `id_b` (undirected pairs)
    * @return (id, cluster_id) with cluster_id = min id of the component
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      maxIters: Int = 50
  ): DataFrame = {
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    // propagate only over edge-incident nodes: components exist only
    // on the edge graph, and dup pairs are a sliver of the corpus —
    // looping over every document's label would shuffle the whole
    // corpus each round for rows that can never change. Singletons
    // rejoin as their own cluster at the end.
    var labels = sym
      .select(col("src").as("id"))
      .distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val neighborMin = sym
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("lbl")).as("nlbl"))
      val stepped = labels
        .join(neighborMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")
        )
      // pointer jumping: replace each label by ITS label (labels are
      // node ids, so they resolve in the same table) — halves the
      // remaining distance to the component min every round, making
      // convergence O(log diameter) instead of O(diameter); a label's
      // label is never larger (min-monotone), so correctness is
      // unchanged and the union-find property spec pins it
      val next = stepped
        .join(
          stepped.select(col("id").as("l_id"), col("lbl").as("l_lbl")),
          col("lbl") === col("l_id"),
          "left"
        )
        .select(col("id"), coalesce(col("l_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("id"), col("lbl").as("old")), "id")
        .filter(col("lbl") =!= col("old"))
        .count()
      // `next` is eagerly materialized and the convergence probe has
      // consumed the old labels — release the superseded round's
      // checkpoint blocks now
      graftshim.GraftSqlShims.unpersistCheckpoint(labels)
      labels = next
      iter += 1
    }
    graftshim.GraftSqlShims.unpersistCheckpoint(sym)
    // fail loudly rather than return non-component-min labels: a
    // component with diameter > maxIters (long chains — use
    // star-contraction for such graphs) would otherwise silently
    // yield multiple "canonical" docs per true component
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "maxIters — raise it or use a star-contraction variant"
      )
    nodes
      .select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") — the variant for adversarial graphs whose diameter
    * exceeds what per-round propagation can cover: each round
    * rewrites the EDGE set itself toward a star per component rooted
    * at the component min, converging in O(log n) rounds regardless
    * of diameter.
    *
    *  - large-star (per node u over the symmetric view): connect every
    *    neighbor v > u to m = min(Γ(u) ∪ {u});
    *  - small-star (per node u over hi→lo directed edges): connect
    *    every smaller neighbor and u itself to m = min(Γ⁻(u) ∪ {u}).
    *
    * Both steps are groupBy-min + equi-join shuffles on node ids —
    * no quadratic expansion; the edge set only contracts toward
    * stars. Convergence is an EXACT set-equality probe (distinct
    * union count vs both counts), not a checksum, so a hash collision
    * can never declare a wrong fixpoint; at the fixpoint every edge
    * is (node, component-min). Same checkpoint/unpersist discipline
    * as the propagation variant. Output contract is identical, so the
    * two variants property-check each other (ClustersSpec).
    */
  def connectedComponentsStars(
      nodes: DataFrame,
      edges: DataFrame,
      maxIters: Int = 50
  ): DataFrame = {
    var e = edges
      .select(
        greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v")
      )
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()
    var converged = eCount == 0L
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star over the symmetric neighbor view: emits (v, m) for
      // every neighbor v > u; v > u >= m keeps the hi→lo direction
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val largeMins = sym
        .groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym
        .join(largeMins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star on the directed result: every strictly-smaller
      // neighbor and u itself re-point to the local min m < u
      val smallMins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large
        .join(smallMins, "u")
        .select(col("v").as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .unionByName(smallMins.select(col("u").as("n"), col("m")))
        .distinct()
        .select(col("n").as("u"), col("m").as("v"))
        .localCheckpoint(true)
      val smallCount = small.count()
      val unionCount = small.unionByName(e).distinct().count()
      converged = smallCount == eCount && unionCount == eCount
      graftshim.GraftSqlShims.unpersistCheckpoint(e)
      e = small
      eCount = smallCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStars did not converge in $maxIters rounds"
      )
    val labels = e
      .select(col("u").as("id"), col("v").as("lbl"))
      .unionByName(e.select(col("v").as("id"), col("v").as("lbl")))
      .distinct()
    nodes
      .select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
  }
}
