package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface scale-killer audit: EVERY query in SparkEntry plans
  * without a Cartesian product, and broadcast-nested-loop joins occur
  * only where a query's design explicitly sanctions one (a broadcast-
  * scale side against a single scan). A regression that slips a
  * cross-pair loop into any of the ~236 plans fails here, not in a
  * 100 TB run.
  */
class WholeSurfacePlanAuditSpec extends SparkSpec {

  /** queries whose DESIGN is a nested-loop pass over a broadcast side
    * of BOUNDED size that is not a scalar aggregate (query/eval sets,
    * range tables — each documented in its scaladoc); scalar-broadcast
    * crossJoins are auto-detected below and need no listing
    */
  private val bnljSanctioned: Set[String] = Set(
    "dedup31_semantic_decontaminate", // eval embeddings vs one corpus scan
    "q90_equi_depth",                 // decile range table assignment
    "sim01_topk_bruteforce",          // broadcast query set, by definition
    "sim05_topk_aggregator",
    "sim12_prefix_rerank",
    "sim13_ann_recall",
    "sim14_label_knn",                // stride sample side, bounded
    "sim19_pq_adc",                   // codebook/query broadcast
    "q48_date_spine",                 // generated spine vs bounds row
    "q64_funnel",                     // step-template edge
    "stream12_late_quarantine",       // watermark scalar vs channels
    "text30_interleave",              // per-source cursor table
    "dedup25_kmv_overlap",            // two k-sized sketch rows
    "pipe05_integrity",               // per-table count rows
    "q85_hdr_quantiles",              // rank-target probe rows (≤ sketch size)
    "q88_grouped_quantiles",
    "sim06_ivf_topk",                 // probed-centroid set
    "sim11_quantized_topk",           // broadcast query vectors
    "sim17_hardneg",
    "sim24_binary_topk"               // query + Hamming shortlist broadcasts
  )

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap(walk)

  /** a BNLJ whose broadcast side is (or wraps) a grouping-less
    * aggregate produces exactly one row — the scalar-broadcast
    * crossJoin idiom (attach a corpus total / normalizer); bounded by
    * construction at any scale
    */
  private def isScalarBroadcast(j: BroadcastNestedLoopJoinExec): Boolean = {
    val bSide = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => j.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
    }
    walk(bSide).exists {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        h.groupingExpressions.isEmpty
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        s.groupingExpressions.isEmpty
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        o.groupingExpressions.isEmpty
      case _ => false
    }
  }

  test("no query plans a cartesian product; BNLJ only bounded-by-design") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.adaptive.enabled")
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val nodes =
          try
            walk(
              graft.SparkEntry
                .queries(name)(spark, sfDir)
                .queryExecution
                .executedPlan
            )
          catch {
            case e: Throwable =>
              offenders += s"$name: planning failed: ${e.getMessage}"
              Seq.empty
          }
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          offenders += s"$name: CartesianProduct"
        val loops = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
        if (
          loops.exists(!isScalarBroadcast(_)) && !bnljSanctioned.contains(name)
        )
          offenders += s"$name: unsanctioned BroadcastNestedLoopJoin"
      }
    } finally conf.set("spark.sql.adaptive.enabled", orig)
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
