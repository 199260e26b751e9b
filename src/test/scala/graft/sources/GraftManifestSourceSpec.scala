package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The manifest log as a real Structured Streaming source: a live
  * `readStream.format("graft-manifest")` drains the DV-aware feed
  * into an arbitrary sink with the ENGINE's checkpointing — folded
  * state ≡ the batch skip-level diff ≡ the head recompute, a
  * kill-and-restart resumes from the engine's offset log with
  * nothing re-emitted, and a source vacuumed past the checkpoint
  * fails actionably instead of silently re-baselining into an
  * append-only sink.
  */
class GraftManifestSourceSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  /** Feed rows → per-source (count, payload) view. The fold is
    * additive over deltas, so it applies equally to one telescoped
    * feed or the union of many per-hop feeds.
    */
  private def foldRows(rows: DataFrame): DataFrame =
    rows.select(col("source"),
      when(col("op") === "insert", lit(1L))
        .when(col("op") === "delete", lit(-1L))
        .otherwise(lit(0L)).as("dd"),
      (coalesce(col("payload_new"), lit(0L)) -
        coalesce(col("payload_old"), lit(0L))).as("dc"))
      .groupBy(col("source"))
      .agg(sum(col("dd")).as("n_docs"), sum(col("dc")).as("chars_sum"))
      .filter(col("n_docs") =!= 0L || col("chars_sum") =!= 0L)

  private def commitV2(root: String): Unit =
    ManifestStore.upsertPartitions(
      docs.filter(col("bucket") === 0)
        .withColumn("n_chars", col("n_chars") + lit(1000000L))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(7000L))
          .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))),
      root, Seq("bucket"))

  test("live drain: baseline + per-version hops fold to the head " +
    "recompute; a materialize hop is silent") {
    val dir = Scratch.tempDir("graft-msource")
    val src = dir + "/src"
    try {
      ManifestStore.write(docs, src, Seq("bucket"))                 // v1
      val q = spark.readStream.format("graft-manifest")
        .option("root", src)
        .option("extraCols", "source")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("memory").queryName("gm_live")
        .option("checkpointLocation", dir + "/ckpt")
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // baseline at v1
        val afterBaseline = spark.table("gm_live").count()
        assert(afterBaseline === docs.count(),
          "the first batch is the full v1 state as inserts")
        commitV2(src)                                                // v2
        DeletionVectors.delete(spark, src, ManifestStore.MAIN,       // v3
          "doc_id", docs.filter(pmod(col("doc_id"), lit(97)) === 0)
            .select(col("doc_id")))
        q.processAllAvailable()
        val afterHops = spark.table("gm_live").count()
        DeletionVectors.materialize(spark, src, ManifestStore.MAIN,  // v4
          "doc_id")
        q.processAllAvailable()
        assert(spark.table("gm_live").count() === afterHops,
          "materialization of DV-dead rows must emit nothing")
        val streamed = foldRows(spark.table("gm_live"))
        val head = ManifestStore.snapshot(spark, src)
        val full = DeletionVectors.read(head)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
        assert(canon(streamed) === canon(full),
          "streamed fold ≡ head recompute")
        // ≡ the batch skip-level diff applied to the v1 baseline
        val s1 = ManifestStore.snapshotAt(spark, src, 1)
        val sN = ManifestStore.snapshotAt(spark, src, head.version)
        val skip = foldRows(
          DeletionVectors.read(s1)
            .select(col("doc_id"), col("n_chars").as("payload_new"),
              lit(null).cast("long").as("payload_old"),
              lit("insert").as("op"), col("source"))
            .unionByName(DeletionVectors.logicalFeed(spark, src, s1, sN,
              extraCols = Seq("source"))
              .select(col("doc_id"), col("payload_new"),
                col("payload_old"), col("op"), col("source"))))
        assert(canon(streamed) === canon(skip), "streamed ≡ skip diff")
      } finally q.stop()
    } finally {
      spark.catalog.dropTempView("gm_live")
      Scratch.deleteRecursively(dir)
    }
  }

  test("kill-and-restart on the engine checkpoint: the second run " +
    "resumes at the recorded version — no baseline re-emission") {
    val dir = Scratch.tempDir("graft-msource-restart")
    val src = dir + "/src"
    val ckpt = dir + "/ckpt"
    try {
      ManifestStore.write(docs, src, Seq("bucket"))                 // v1
      commitV2(src)                                                  // v2
      // the recoverable-sink shape: foreachBatch + the engine's own
      // checkpoint (the memory sink refuses recovery by design)
      def run(): DataFrame = {
        val got = new java.util.concurrent.ConcurrentLinkedQueue[
          Seq[org.apache.spark.sql.Row]]()
        val q = spark.readStream.format("graft-manifest")
          .option("root", src).option("extraCols", "source")
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) =>
            got.add(b.collect().toSeq); ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        import scala.jdk.CollectionConverters._
        val rows = got.asScala.flatten.toSeq
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          GraftManifestSource.feedSchema(spark,
            Map("root" -> src, "extraCols" -> "source")))
      }
      val run1 = run().localCheckpoint(true)
      assert(run1.count() === DeletionVectors.read(
        ManifestStore.snapshot(spark, src)).count(),
        "run 1 telescopes v1..v2 into one baseline")
      // the consumer dies; the source moves on
      DeletionVectors.delete(spark, src, ManifestStore.MAIN, "doc_id", // v3
        docs.filter(pmod(col("doc_id"), lit(97)) === 0)
          .select(col("doc_id")))
      val run2 = run().localCheckpoint(true)
      assert(run2.filter(col("op") === "insert").count() === 0L,
        "a restart must NOT re-emit the baseline")
      assert(run2.filter(col("op") === "delete").count() ===
        docs.filter(pmod(col("doc_id"), lit(97)) === 0).count(),
        "the restarted run carries exactly the pending hop's deletes")
      val streamed = foldRows(run1.unionByName(run2))
      val full = DeletionVectors.read(ManifestStore.snapshot(spark, src))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
      assert(canon(streamed) === canon(full))
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(run1)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(run2)
    } finally Scratch.deleteRecursively(dir)
  }

  test("source vacuumed past the stream checkpoint: the next batch " +
    "fails with the actionable retention error, not a silent rebase") {
    val dir = Scratch.tempDir("graft-msource-vac")
    val src = dir + "/src"
    val ckpt = dir + "/ckpt"
    try {
      ManifestStore.write(docs, src, Seq("bucket"))                 // v1
      def run(): Unit = {
        val q = spark.readStream.format("graft-manifest")
          .option("root", src).option("extraCols", "source").load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      run() // cursor at v1
      commitV2(src)                                                  // v2
      commitV2(src)                                                  // v3
      ManifestStore.vacuum(spark, src, retainVersions = 1)
      assert(ManifestStore.versions(spark, src).head > 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("vacuumed past")),
        s"want the retention error, got: ${messages(e).mkString(" | ")}")
    } finally Scratch.deleteRecursively(dir)
  }
}
