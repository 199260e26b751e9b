package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-group-granular zone maps: once compaction produces large
  * multi-row-group files, file-level (min, max) stops helping inside
  * the file — the manifest now carries per-group integral bounds, the
  * group census proves intra-file skipping WITHOUT opening a file,
  * the group-sharpened file screen drops range-in-gap files the file
  * envelope keeps, and the pushed-down residual makes the actual scan
  * read only the intersecting groups (pinned via scan metrics).
  */
class RowGroupStatsSpec extends SparkSpec {

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  /** A compacted store: one id-sorted file with a small parquet block
    * size, so the fixture produces many row groups — the shape
    * Compaction.execute manufactures at scale.
    */
  private def buildCompacted(root: String): DataFrame = {
    val wide = (0 until 40).map { i =>
      Tables(spark, sfDir).documents
        .select(col("doc_id"), col("text"),
          col("n_chars").cast("long").as("n_chars"))
        .withColumn("doc_id", col("doc_id") + lit(500L * i))
    }.reduce(_ unionByName _).localCheckpoint(true)
    ManifestStore.commit(spark, root, Seq(ManifestStore.stage(
      wide.coalesce(1).sortWithinPartitions("doc_id"),
      root, ManifestStore.MAIN, Seq.empty, ManifestStore.Replace,
      writerOptions = Map(
        "parquet.block.size" -> (64 * 1024).toString,
        "parquet.page.size" -> (8 * 1024).toString))))
    wide
  }

  test("multi-group footers land in the manifest; the census proves " +
    "intra-file skipping; the sharpened read stays exact") {
    val root = Scratch.tempDir("graft-rg")
    try {
      val wide = buildCompacted(root)
      val snap = ManifestStore.snapshot(spark, root)
      val files = snap.state(ManifestStore.MAIN)
        .partitions.values.flatMap(_.files).toSeq
      assert(files.length === 1, "the compacted store is ONE file")
      val f = files.head
      assert(f.groups.length > 1,
        s"fixture must produce multiple row groups, got ${f.groups.length}")
      assert(f.groups.map(_.rows).sum === f.rows,
        "group row counts must partition the file")
      // groups of an id-sorted file carry tight, ordered id bounds
      val bounds = f.groups.map(_.stats("doc_id"))
      assert(bounds.sliding(2).forall {
        case Seq((_, aMax), (bMin, _)) => aMax <= bMin
        case _                         => true
      }, "id-sorted groups must have non-overlapping ascending bounds")

      // a quartile range probe: the census says most groups skip
      val ranges = Seq(("doc_id", 5000L, 7499L))
      val (gk, gt, rk, rt) = snap.rowGroupPrune(ManifestStore.MAIN, ranges)
      assert(gt === f.groups.length && rt === f.rows)
      assert(gk < gt && gk > 0, s"probe must skip groups: $gk of $gt kept")
      assert(rk < rt, "rows in kept groups < file rows — intra-file skipping")
      // exactness: the sharpened read ≡ the plain filter
      val got = snap.readBoxRG(ManifestStore.MAIN, ranges)
      assert(canon(got) === canon(
        wide.filter(col("doc_id") >= 5000L && col("doc_id") <= 7499L)))

      // the SCAN actually skipped: pushed-down range + footer bounds
      // mean the reader materializes only the kept groups' rows
      val agg = snap.readBoxRG(ManifestStore.MAIN, ranges)
        .agg(count(lit(1)), sum(col("n_chars")))
      agg.collect()
      val scans = scanNodes(agg.queryExecution.executedPlan)
      assert(scans.nonEmpty, "no parquet scan found in the executed plan")
      val scanned = scans.map(_.metrics("numOutputRows").value).sum
      assert(scanned <= rk,
        s"scan read $scanned rows; kept groups hold $rk — pushdown lost?")
      assert(scanned < rt, "the scan must not read the whole file")
      assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(p => p.contains("GreaterThanOrEqual(doc_id")
          && p.contains("LessThanOrEqual(doc_id"))),
        "the range residual must reach the parquet reader")

      // range-in-gap: a probe BETWEEN two adjacent groups' bounds is
      // exonerated by the group screen even though the file envelope
      // covers it (file-level pruning keeps the file)
      bounds.sliding(2).collectFirst {
        case Seq((_, aMax), (bMin, _)) if bMin > aMax + 1 => (aMax + 1, bMin - 1)
      } match {
        case Some((lo, hi)) =>
          val gap = Seq(("doc_id", lo, hi))
          assert(snap.prunedFiles(ManifestStore.MAIN, gap)._1.length === 1)
          assert(snap.prunedFilesRG(ManifestStore.MAIN, gap)._1.isEmpty,
            "a range in the inter-group gap must drop the file entirely")
          assert(snap.readBoxRG(ManifestStore.MAIN, gap).count() === 0L)
        case None => // contiguous ids: no gap to probe — fine
      }
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(wide)
    } finally Scratch.deleteRecursively(root)
  }

  test("string row-group bounds: a source-sorted compacted file skips " +
    "groups on a string probe; the sharpened read stays exact") {
    val root = Scratch.tempDir("graft-rg-str")
    try {
      // 40 shifted copies, sorted by SOURCE then id: each row group
      // holds a contiguous source run, so its truncated (min,max)
      // string bounds are tight
      val wide = (0 until 40).map { i =>
        Tables(spark, sfDir).documents
          .select(col("doc_id"), col("source"), col("text"),
            col("n_chars").cast("long").as("n_chars"))
          .withColumn("doc_id", col("doc_id") + lit(500L * i))
      }.reduce(_ unionByName _).localCheckpoint(true)
      ManifestStore.commit(spark, root, Seq(ManifestStore.stage(
        wide.coalesce(1).sortWithinPartitions("source", "doc_id"),
        root, ManifestStore.MAIN, Seq.empty, ManifestStore.Replace,
        writerOptions = Map(
          "parquet.block.size" -> (64 * 1024).toString,
          "parquet.page.size" -> (8 * 1024).toString))))
      val snap = ManifestStore.snapshot(spark, root)
      val f = snap.state(ManifestStore.MAIN)
        .partitions.values.flatMap(_.files).head
      assert(f.groups.length > 1)
      assert(f.groups.forall(_.strStats.contains("source")),
        "every group must carry truncated source bounds")
      val ranges = Seq(("source", "src13", "src15"))
      val (gk, gt, rk, rt) = snap.rowGroupPruneStr(ManifestStore.MAIN, ranges)
      assert(gk < gt && gk > 0, s"string probe must skip groups: $gk of $gt")
      assert(rk < rt)
      val got = snap.readBoxStrRG(ManifestStore.MAIN, ranges)
      assert(canon(got) === canon(
        wide.filter(col("source") >= "src13" && col("source") <= "src15")))
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(wide)
    } finally Scratch.deleteRecursively(root)
  }

  test("single-group files carry no group list (zero log overhead) and " +
    "prune identically at group granularity") {
    val root = Scratch.tempDir("graft-rg-single")
    try {
      val docs = Tables(spark, sfDir).documents
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))
      ManifestStore.write(docs, root, Seq("bucket"))
      val snap = ManifestStore.snapshot(spark, root)
      val files = snap.state(ManifestStore.MAIN)
        .partitions.values.flatMap(_.files)
      assert(files.forall(_.groups.isEmpty),
        "small files must not pay per-group bytes in the log")
      val ranges = Seq(("doc_id", 150L, 249L))
      val (kept, total) = snap.prunedFilesRG(ManifestStore.MAIN, ranges)
      assert((kept.map(_.path), total) ===
        (snap.prunedFiles(ManifestStore.MAIN, ranges)._1.map(_.path), total))
      val (gk, gt, rk, rt) = snap.rowGroupPrune(ManifestStore.MAIN, ranges)
      assert(gt === files.size && gk === kept.length)
      assert(rk === kept.map(_.rows).sum && rt === docs.count())
    } finally Scratch.deleteRecursively(root)
  }

  private def scanNodes(
      p: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scanNodes(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scanNodes)
  }
}
