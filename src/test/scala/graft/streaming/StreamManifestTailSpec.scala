package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sources.{DeletionVectors, ManifestStore, Scratch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The live manifest tail's recovery contract (the StreamRecoverySpec
  * discipline applied to the consume side): the cursor rides the
  * target store's batch ledger, so a consumer killed ANYWHERE in the
  * history resumes at the first unapplied version with nothing
  * applied twice, rate limiting bounds each poll, independent sinks
  * tail independently, and the drained view equals both the one-hop
  * skip-level fold and the full recompute.
  */
class StreamManifestTailSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def init(state: DataFrame): DataFrame =
    state.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("chars_sum"))

  private def fold(view: DataFrame, feed: DataFrame): DataFrame = {
    val deltas = feed.select(col("source"),
      when(col("op") === "insert", lit(1L))
        .when(col("op") === "delete", lit(-1L))
        .otherwise(lit(0L)).as("dd"),
      (coalesce(col("payload_new"), lit(0L)) -
        coalesce(col("payload_old"), lit(0L))).as("dc"))
      .groupBy(col("source"))
      .agg(sum(col("dd")).as("dd"), sum(col("dc")).as("dc"))
    view.join(deltas, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n_docs"), lit(0L)) +
          coalesce(col("dd"), lit(0L))).as("n_docs"),
        (coalesce(col("chars_sum"), lit(0L)) +
          coalesce(col("dc"), lit(0L))).as("chars_sum"))
  }

  private def buildHistory(root: String): Unit = {
    ManifestStore.write(docs, root, Seq("bucket"))                  // v1
    ManifestStore.upsertPartitions(                                  // v2
      docs.filter(col("bucket") === 0)
        .withColumn("n_chars", col("n_chars") + lit(1000000L))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(7000L))
          .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))),
      root, Seq("bucket"))
    DeletionVectors.delete(spark, root, ManifestStore.MAIN, "doc_id", // v3
      docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id")))
    DeletionVectors.materialize(spark, root, ManifestStore.MAIN,     // v4
      "doc_id")
  }

  private def poll(src: String, tgt: String, sink: String, max: Int) =
    StreamManifestTail.pollOnce(spark, src, tgt, sink, max,
      extraCols = Seq("source"))(init, fold)

  test("kill-and-restart mid-history: the ledger cursor resumes " +
    "exactly; rate limiting bounds each poll; drained ≡ skip ≡ recompute") {
    val src = Scratch.tempDir("graft-tail-src")
    val tgt = Scratch.tempDir("graft-tail-tgt") + "/t"
    try {
      buildHistory(src)
      // poll 1: first contact materializes the baseline at v1
      assert(poll(src, tgt, "tail-a", 2) === Seq(1L))
      assert(ManifestStore.snapshot(spark, tgt).batches("tail-a") === 1L)
      // poll 2: rate-limited to TWO hops (v2, v3) of the three pending
      assert(poll(src, tgt, "tail-a", 2) === Seq(2L, 3L))
      // ...the consumer dies here; a fresh "process" resumes from the
      // persisted cursor — nothing re-applied, v4 picked up
      assert(ManifestStore.snapshot(spark, tgt).batches("tail-a") === 3L)
      assert(poll(src, tgt, "tail-a", 2) === Seq(4L))
      // caught up: the next poll is a no-op
      assert(poll(src, tgt, "tail-a", 2) === Seq.empty)
      assert(ManifestStore.snapshot(spark, tgt).batches("tail-a") === 4L)

      val tailView = ManifestStore.read(spark, tgt)
      // skip-level fold: one telescoped hop v1 -> v4
      val s1 = ManifestStore.snapshotAt(spark, src, 1)
      val s4 = ManifestStore.snapshotAt(spark, src, 4)
      val skipView = fold(init(DeletionVectors.read(s1)),
        DeletionVectors.logicalFeed(spark, src, s1, s4,
          extraCols = Seq("source")))
      // recompute from the head state
      val fullView = init(DeletionVectors.read(s4))
      assert(canon(tailView) === canon(fullView), "tail ≡ recompute")
      assert(canon(skipView) === canon(fullView), "skip ≡ recompute")
    } finally {
      Scratch.deleteRecursively(src)
      Scratch.deleteRecursively(new java.io.File(tgt).getParent)
    }
  }

  test("source vacuumed past the cursor: the consumer re-baselines at " +
    "the oldest readable version instead of wedging") {
    val src = Scratch.tempDir("graft-tail-vac")
    val tgt = Scratch.tempDir("graft-tail-vact") + "/t"
    try {
      buildHistory(src)
      // consumer applies v1 only, then goes dark
      assert(poll(src, tgt, "tail-v", 1) === Seq(1L))
      // source retention moves on: only the head survives
      ManifestStore.vacuum(spark, src, retainVersions = 1)
      val readable = ManifestStore.versions(spark, src)
      assert(readable.head > 1L, "v1 must be gone for this arm")
      // the wedged-forever shape pre-fix: snapshotAt(cursor) threw on
      // every subsequent poll. Now: one re-baseline poll at the oldest
      // readable version, then business as usual
      assert(poll(src, tgt, "tail-v", 2) === Seq(readable.head))
      while (poll(src, tgt, "tail-v", 2).nonEmpty) ()
      val fullView = init(DeletionVectors.read(
        ManifestStore.snapshot(spark, src)))
      assert(canon(ManifestStore.read(spark, tgt)) === canon(fullView),
        "re-baselined tail ≡ recompute at head")
    } finally {
      Scratch.deleteRecursively(src)
      Scratch.deleteRecursively(new java.io.File(tgt).getParent)
    }
  }

  test("delta-fold view maintenance: a hop commits O(changed " +
    "partitions) — untouched view partitions are byte-identical") {
    val src = Scratch.tempDir("graft-tail-delta")
    val tgt = Scratch.tempDir("graft-tail-deltat") + "/t"
    try {
      ManifestStore.write(docs, src, Seq("bucket"))                  // v1
      def pollD() = StreamManifestTail.pollOnce(spark, src, tgt,
        "tail-d", 4, extraCols = Seq("source"),
        viewPartitionCols = Seq("source"))(init, fold)
      assert(pollD() === Seq(1L))
      val t1 = ManifestStore.snapshot(spark, tgt)
      assert(t1.state(ManifestStore.MAIN).partitionCols === Seq("source"),
        "the delta-fold view is partitioned by its dimension")
      // a hop that changes ONE source's docs only: bucket 0 rewrites
      // whole (the Upsert unit), but only src0's payloads move — the
      // logical feed silences the byte-equal rest
      val src0 = docs.select(min(col("source"))).head.getString(0)
      ManifestStore.upsertPartitions(                                // v2
        docs.filter(col("bucket") === 0)
          .withColumn("n_chars",
            when(col("source") === src0, col("n_chars") + lit(1000000L))
              .otherwise(col("n_chars"))),
        src, Seq("bucket"))
      assert(pollD() === Seq(2L))
      val t2 = ManifestStore.snapshot(spark, tgt)
      // ONLY the touched source's view partition changed
      val changed = ManifestStore.changedPartitionKeys(t1, t2)
      assert(changed === Set(s"source=$src0"),
        s"one source changed, view rewrote $changed")
      // ...and the hop's commit carried only that partition's bytes
      val (added, _) = ManifestStore.fileDiff(t1, t2)
      assert(added.nonEmpty && added.forall(_.path.contains(
        s"__p_source=$src0")), s"added ${added.map(_.path)}")
      // correctness unchanged: delta-folded view ≡ recompute
      val full = init(DeletionVectors.read(
        ManifestStore.snapshot(spark, src)))
      assert(canon(ManifestStore.read(spark, tgt)) === canon(full))
      // ... and ≡ the whole-view Replace tail over the same history
      val tgtR = new java.io.File(tgt).getParent + "/r"
      while (StreamManifestTail.pollOnce(spark, src, tgtR, "tail-r", 4,
        extraCols = Seq("source"))(init, fold).nonEmpty) ()
      assert(canon(ManifestStore.read(spark, tgt)) ===
        canon(ManifestStore.read(spark, tgtR)))
    } finally {
      Scratch.deleteRecursively(src)
      Scratch.deleteRecursively(new java.io.File(tgt).getParent)
    }
  }

  test("independent sinks tail independently from their own cursors") {
    val src = Scratch.tempDir("graft-tail-src2")
    val tgtA = Scratch.tempDir("graft-tail-ta") + "/a"
    val tgtB = Scratch.tempDir("graft-tail-tb") + "/b"
    try {
      buildHistory(src)
      // A drains fully; B stops mid-history, then catches up
      while (poll(src, tgtA, "tail-a", 4).nonEmpty) ()
      assert(poll(src, tgtB, "tail-b", 1) === Seq(1L))
      assert(poll(src, tgtB, "tail-b", 1) === Seq(2L))
      while (poll(src, tgtB, "tail-b", 1).nonEmpty) ()
      assert(canon(ManifestStore.read(spark, tgtA)) ===
        canon(ManifestStore.read(spark, tgtB)))
    } finally {
      Scratch.deleteRecursively(src)
      Scratch.deleteRecursively(new java.io.File(tgtA).getParent)
      Scratch.deleteRecursively(new java.io.File(tgtB).getParent)
    }
  }
}
