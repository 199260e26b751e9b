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
    "q106_winsorize_sketch",          // same rank-probe rows (2 per series)
    "sim06_ivf_topk",                 // probed-centroid set
    "sim11_quantized_topk",           // broadcast query vectors
    "sim17_hardneg",
    "sim24_binary_topk",              // query + Hamming shortlist broadcasts
    "dedup36_semantic_decon_sketch",  // eval signatures vs one corpus scan
    // dedup40's exhaustive baseline arm is still a sanctioned BNLJ,
    // but the arms now run EAGERLY inside the builder and the
    // returned frame is the collected curve — the audit sees no BNLJ
    // (the per-arm shape is pinned in PlanBudgetSpec/BandedDeconSpec)
    "q101_zorder_layout",             // 3-row probe table vs 64-row zone maps
    "sim25_nprobe_curve"              // sim06's probed-centroid set, swept
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

  /** Every query planned once (AQE off so the tree is walkable — see
    * PlanBudgetSpec), shared by all whole-surface audits below.
    */
  private lazy val planned: Seq[(String, Either[String, Seq[SparkPlan]])] = {
    val conf = spark.conf
    val orig = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      graft.SparkEntry.queries.keys.toSeq.sorted.map { name =>
        name -> (try
          Right(
            walk(
              graft.SparkEntry
                .queries(name)(spark, sfDir)
                .queryExecution
                .executedPlan
            )
          )
        catch {
          case e: Throwable => Left(s"planning failed: ${e.getMessage}")
        })
      }
    } finally conf.set("spark.sql.adaptive.enabled", orig)
  }

  test("no query plans a cartesian product; BNLJ only bounded-by-design") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    planned.foreach {
      case (name, Left(err)) => offenders += s"$name: $err"
      case (name, Right(nodes)) =>
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          offenders += s"$name: CartesianProduct"
        val loops = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
        if (
          loops.exists(!isScalarBroadcast(_)) && !bnljSanctioned.contains(name)
        )
          offenders += s"$name: unsanctioned BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** queries whose design runs a window WITHOUT partitioning over a
    * frame that is bounded by construction (each documented in its
    * scaladoc) — every other query must partition every window, so an
    * accidental global sort-everything window fails here instead of
    * warning invisibly in a log.
    */
  private val globalWindowSanctioned: Set[String] = Set(
    "q37_ntile",               // the exact-tile SPEC anchor by definition (scale form: q98)
    "q99_ntile_disagreement",  // compares AGAINST the exact anchor — inherits q37's window
    "pipe03_full_pipeline",    // pack level-2: ~sqrt(n) bucket-summary rows
    "text10_pack",             // pack level-2 (PackPlanSpec pins the sqrt(n) width)
    "text17_pack_spans",       // same two-level pack scan
    "text37_pack_sequences",   // same two-level pack scan
    "q67_skyline",             // running max over per-DATE maxima (dense date domain)
    "q84_neyman_sample",       // allocation over per-stratum summary rows
    "q85_hdr_quantiles",       // rank read over <=1K sketch buckets
    "q90_equi_depth",          // same sketch-first bucket table
    "sim18_kmeans",            // K-row stride-seed numbering
    "sim19_pq_adc",            // codebook-sized windows
    "sim20_ivf_pq",            // codebook + K-row centroid tables
    "sim21_residual_pq",       // two codebook stages
    "stream12_late_quarantine",// per-channel watermark rows
    "text18_heaps",            // running totals over exactly heapsSlices rows
    "text24_zipf",             // rank AFTER limit(zipfV) — bounded head
    "text29_water_fill",       // budget walk over per-source rows
    "text30_interleave",       // per-source cursor table
    "text34_temperature_mix",  // per-source weight rows
    "text36_neg_sampling"      // vocabulary-keyed sampling table (Heaps-bounded)
  )

  test("unpartitioned windows only where the frame is bounded by design") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    planned.foreach {
      case (_, Left(_)) => () // reported by the BNLJ audit
      case (name, Right(nodes)) =>
        val global = nodes.exists {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        if (global && !globalWindowSanctioned.contains(name))
          offenders += s"$name: unpartitioned Window"
        if (!global && globalWindowSanctioned.contains(name))
          offenders += s"$name: sanctioned but plans no global window (stale list)"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
