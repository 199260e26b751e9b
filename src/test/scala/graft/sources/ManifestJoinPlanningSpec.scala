package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-driven JOIN PLANNING: a store read serves its size to the
  * optimizer from the manifest's own file metadata (the FileIndex's
  * `sizeInBytes` is the logged byte sum — zero filesystem stats), so
  * a store-vs-store join broadcasts the small side AUTOMATICALLY,
  * with no `broadcast()` hint — the decision a 100 TB fact-vs-dim
  * join lives on. The dual is pinned too: two large sides must NOT
  * broadcast.
  */
class ManifestJoinPlanningSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("a small store auto-broadcasts against a large one from manifest " +
    "stats; large-vs-large shuffles") {
    val big = Scratch.tempDir("graft-jp-big")
    val small = Scratch.tempDir("graft-jp-small")
    // a fixture-sized "fact" compresses under the default 10 MB
    // threshold — scale the threshold to the fixture (the decision
    // BOUNDARY is what's pinned, not the production constant)
    val origThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "262144")
    try {
      // big: 40 shifted copies with text payloads (megabytes)
      val wide = (0 until 40).map { i =>
        Tables(spark, sfDir).documents
          .select(col("doc_id"), col("text"),
            col("n_chars").cast("long").as("n_chars"))
          .withColumn("doc_id", col("doc_id") + lit(500L * i))
      }.reduce(_ unionByName _)
        .withColumn("bucket", expr("CAST(doc_id DIV 2000 AS BIGINT)"))
      ManifestStore.write(wide, big, Seq("bucket"))
      // small: a 25-row dim (one source's ids)
      ManifestStore.write(
        docs.filter(col("source") === "src0")
          .select(col("doc_id"), col("source")),
        small, Seq.empty)

      val bigDf = ManifestStore.read(spark, big)
      val smallDf = ManifestStore.read(spark, small)
      // the manifest-backed scan reports its logged size to the
      // optimizer — the broadcast decision's input
      val smallBytes = ManifestStore.snapshot(spark, small)
        .state(ManifestStore.MAIN).partitions.values.map(_.bytes).sum
      assert(smallDf.queryExecution.optimizedPlan.stats.sizeInBytes
        <= BigInt(smallBytes) * 10,
        "the dim scan must expose a manifest-derived (small) size")

      // NO hint anywhere: the optimizer must pick broadcast by stats
      val joined = bigDf.join(smallDf, Seq("doc_id"))
        .agg(count(lit(1)), sum(col("n_chars")))
      val plan = planOf(joined)
      assert(plan.contains("BroadcastHashJoin"),
        s"small store must auto-broadcast:\n${plan.take(800)}")
      assert(!plan.contains("SortMergeJoin"))
      // correctness of the planned join
      assert(joined.collect().head.getLong(0) === 25L)

      // the dual: big ⋈ big must NOT broadcast when the build side
      // genuinely carries the payload columns (a wrong size estimate
      // that broadcasts a multi-MB side OOMs a real executor fleet).
      // Both sides keep `text`, so column pruning cannot shrink the
      // estimate — and note the estimate IS pruning-aware: the
      // doc_id-only self-join correctly broadcasts (asserted below)
      val self = bigDf.select(col("doc_id"), col("text"))
        .join(ManifestStore.read(spark, big)
          .select(col("doc_id"), col("text").as("t2")),
          Seq("doc_id"))
        .agg(count(lit(1)), sum(length(col("t2")) + length(col("text"))))
      val selfPlan = planOf(self)
      assert(!selfPlan.contains("BroadcastHashJoin"),
        s"large-vs-large must shuffle, not broadcast:\n${selfPlan.take(800)}")
      // pruning-aware sizing: the SAME self-join on the key column
      // alone is tiny after pruning and rightly broadcasts
      val keysOnly = bigDf.select(col("doc_id"))
        .join(ManifestStore.read(spark, big).select(col("doc_id")),
          Seq("doc_id"))
        .agg(count(lit(1)))
      assert(planOf(keysOnly).contains("BroadcastHashJoin"),
        "a column-pruned key-only side must broadcast — the estimate " +
          "tracks the READ columns, not the file bytes")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", origThresh)
      Scratch.deleteRecursively(big)
      Scratch.deleteRecursively(small)
    }
  }
}
