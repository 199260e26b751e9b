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

  test("manifest ROW COUNTS reach the optimizer: a wide-payload " +
    "small-row dim broadcasts under CBO where file bytes alone refuse") {
    val dim = Scratch.tempDir("graft-jp-rows")
    val origThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val origCbo = spark.conf.get("spark.sql.cbo.enabled")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    // the STATIC planner is the subject here: AQE would rescue the
    // bytes-only misestimate at runtime, but only AFTER both sides
    // paid their shuffle map stages — plan-time cardinality avoids
    // scheduling the shuffle at all, which is the 100 TB win
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 25 rows, each dragging ~38 KB of hash-chain payload (hex —
      // parquet still halves it): file bytes land far above the
      // broadcast threshold while the projected join side is a few
      // hundred bytes
      val payload = concat_ws("", (0 until 300).map(i =>
        sha2(concat(col("text"), lit(i.toString)), 512)): _*)
      ManifestStore.write(
        Tables(spark, sfDir).documents
          .filter(col("source") === "src0")
          .select(col("doc_id"), payload.as("blob")),
        dim, Seq.empty)
      val st = ManifestStore.snapshot(spark, dim).state(ManifestStore.MAIN)
      val dimBytes = st.partitions.values.map(_.bytes).sum
      assert(dimBytes > 180224L,
        s"fixture must exceed the scaled threshold in bytes, got $dimBytes")
      val dimRows = st.partitions.values.map(_.rows).sum

      // the fact is 40 shifted copies — big enough that ITS estimate
      // never broadcasts, so the decision under test is the dim's
      def joined() = (0 until 40).map { i =>
        Tables(spark, sfDir).documents
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
          .withColumn("doc_id", col("doc_id") + lit(500L * i))
      }.reduce(_ unionByName _)
        .join(ManifestStore.read(spark, dim).select(col("doc_id")),
          Seq("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))

      // bytes-only sizing (CBO off): the projection scales the BYTE
      // estimate by type widths — the blob's true weight never leaves
      // the estimate, so the dim refuses to broadcast
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val planOff = planOf(joined())
      assert(!planOff.contains("BroadcastHashJoin"),
        s"bytes-only must refuse here (the arm's premise):\n" +
          planOff.take(800))
      val resultOff = joined().collect().head

      // with CBO, the manifest's rowCount re-estimates the projected
      // side as rows x projected width — and it rightly broadcasts
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val dimScan = ManifestStore.read(spark, dim).select(col("doc_id"))
      val est = dimScan.queryExecution.optimizedPlan.stats
      assert(est.rowCount.contains(BigInt(dimRows)),
        s"the manifest row count must reach plan stats, got $est")
      val planOn = planOf(joined())
      assert(planOn.contains("BroadcastHashJoin"),
        s"rowCount-driven sizing must broadcast the $dimRows-row dim:\n" +
          planOn.take(800))
      val resultOn = joined().collect().head
      assert(resultOn === resultOff,
        "the plan changed, the answer must not")
      assert(resultOn.getLong(0) > 0L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", origAqe)
      spark.conf.set("spark.sql.cbo.enabled", origCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", origThresh)
      Scratch.deleteRecursively(dim)
    }
  }
}
