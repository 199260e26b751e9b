package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dedup32 (cluster-level train/eval split) and dedup33 (delete
  * propagation): the structural guarantees the DuckDB oracle can't
  * express directly — zero cross-split leakage by construction, and
  * incremental (touched-clusters-only) recompute ≡ full recompute
  * built from the library's own primitives.
  */
class ClusterSplitDeleteSpec extends SparkSpec {

  test("dedup32: no confirmed near-dup pair straddles the split") {
    val split = graft.ops.DedupQueries3
      .queries("dedup32_cluster_split")(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val pairs = graft.ops.DedupQueries
      .queries("dedup04_minhash_lsh")(spark, sfDir)
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b")
    val straddling = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling === 0L, "cluster-keyed split must be leakage-free")
    // and the split is non-degenerate on the fixture
    val sides = split.select("split").distinct().count()
    assert(sides === 2L, "fixture must exercise both split sides")
  }

  test("dedup33: incremental delete propagation equals full recompute") {
    val incremental = graft.ops.DedupQueries3
      .queries("dedup33_delete_propagation")(spark, sfDir)

    // full recompute from the library's own primitives on the
    // post-delete corpus (independent of the DuckDB mirror)
    val delPred = pmod(
      graft.functions.PortableHash
        .h32(concat(lit("del:"), col("doc_id").cast("string"))),
      lit(graft.ops.DedupQueries3.DEL_MOD)
    ) === 0
    val live = graft
      .Tables(spark, sfDir)
      .documents
      .filter(!delPred)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions
          .tokenCount(col("text"))
          .cast("long")
          .as("n_tokens")
      )
    val liveIds = live.select(col("doc_id"))
    val edges = graft.ops.DedupQueries
      .queries("dedup04_minhash_lsh")(spark, sfDir)
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b")
      .join(liveIds.select(col("doc_id").as("id_a")), Seq("id_a"), "left_semi")
      .join(liveIds.select(col("doc_id").as("id_b")), Seq("id_b"), "left_semi")
    val members = Clusters
      .connectedComponents(liveIds.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .join(live, Seq("doc_id"))
    val best = members
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("n_tokens"), (-col("doc_id")).as("__negid"))).as("__m"))
      .select(col("cluster_id"), (-col("__m.__negid")).as("survivor_id"))
    val full = members
      .join(best, Seq("cluster_id"))
      .select(
        col("doc_id"),
        col("cluster_id"),
        col("n_tokens"),
        col("survivor_id"),
        (col("doc_id") === col("survivor_id")).as("keep")
      )

    val inc = incremental.collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val ful = full.orderBy("doc_id").collect().map(_.toSeq)
      .sortBy(_.head.toString.toLong)
    assert(inc.length === ful.length)
    inc.zip(ful).foreach { case (a, b) => assert(a === b) }

    // deleted docs are gone from the verdict
    val deletedInOutput = incremental
      .join(
        graft.Tables(spark, sfDir).documents.filter(delPred).select("doc_id"),
        Seq("doc_id"),
        "left_semi"
      )
      .count()
    assert(deletedInOutput === 0L)
    // and the fixture actually deletes something
    val nDel = graft.Tables(spark, sfDir).documents.filter(delPred).count()
    assert(nDel > 0L, "DEL_MOD predicate must fire on the fixture")
  }
}
