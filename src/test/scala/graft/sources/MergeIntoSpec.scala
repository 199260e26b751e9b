package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO's defining equivalence: applying a change log through
  * [[MergeInto.merge]] batch by batch (each batch REDELIVERED — the
  * at-least-once schedule) lands on exactly the state
  * [[graft.cdc.Materializer]] computes from the whole log at once —
  * plus the storage-level properties batch materialization cannot
  * show: deletes are O(k) vector entries, a reinsert clears its
  * vector entry AND rewrites the stale row's partition, a partition
  * emptied by moves is dropped, and redeliveries publish nothing.
  */
class MergeIntoSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def ev(df: DataFrame, op: String, ts: Long, seq: Long) =
    df.select(col("doc_id"), col("source"), col("n_chars"),
      lit(op).as("op"), lit(ts).as("ts"), lit(seq).as("seq"))

  test("merge batches + redeliveries ≡ one-shot materialize; deletes " +
    "are vector entries; reinserts clear them") {
    val root = Scratch.tempDir("graft-merge-eq")
    try {
      ManifestStore.write(docs, root, Seq("source"))               // v1
      val k = col("doc_id")
      val b0 = ev(docs.filter(pmod(k, lit(5)) === 0)
        .withColumn("n_chars", col("n_chars") + lit(1000000L)), "U", 1, 1)
        .unionByName(ev(docs.filter(pmod(k, lit(7)) === 3), "D", 1, 2))
        .unionByName(ev(docs.filter(pmod(k, lit(11)) === 0)
          .withColumn("doc_id", k + lit(10000L)), "I", 1, 3))
      // b1: reinsert some deleted keys, move some keys to a new
      // partition value, delete more
      val b1 = ev(docs.filter(pmod(k, lit(7)) === 3 && pmod(k, lit(2)) === 1)
        .withColumn("n_chars", col("n_chars") + lit(500000L)), "I", 2, 1)
        .unionByName(ev(docs.filter(pmod(k, lit(13)) === 1)
          .withColumn("source", lit("moved")), "U", 2, 2))
        .unionByName(ev(docs.filter(pmod(k, lit(10)) === 0), "D", 2, 3))
      Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
        val (_, first) = MergeInto.merge(spark, root, b, "sink-a", id)
        assert(first, s"first delivery of batch $id must publish")
        val (_, again) = MergeInto.merge(spark, root, b, "sink-a", id)
        assert(!again, s"redelivery of batch $id must be a no-op")
      }
      val snap = ManifestStore.snapshot(spark, root)
      assert(snap.version === 3L,
        "redeliveries must not mint versions: v1 + 2 merges")
      // the semantic oracle: the whole log reduced at once over the
      // base treated as epoch-zero inserts
      val base = ev(docs, "I", 0, 0)
      val expect = graft.cdc.Materializer.materialize(
        base.unionByName(b0).unionByName(b1), keyCol = "doc_id")
      assert(canon(DeletionVectors.read(snap)) === canon(expect))
      // time travel still serves every intermediate state
      assert(canon(DeletionVectors.read(
        ManifestStore.snapshotAt(spark, root, 1))) === canon(docs))
    } finally Scratch.deleteRecursively(root)
  }

  test("a DV-dead row's partition is rewritten on reinsert — the stale " +
    "physical row cannot resurrect when the vector entry clears") {
    val root = Scratch.tempDir("graft-merge-stale")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val victim = docs.orderBy("doc_id").limit(1)
        .localCheckpoint(true)
      val vid = victim.head.getLong(0)
      // DV-delete OUTSIDE merge (an RTBF path): the physical row stays
      DeletionVectors.delete(spark, root, ManifestStore.MAIN, "doc_id",
        victim.select(col("doc_id")))
      // now MERGE a reinsert of the same key with a NEW payload
      val reins = ev(victim.withColumn("n_chars", lit(424242L)), "I", 9, 1)
      MergeInto.merge(spark, root, reins, "sink-b", 0L)
      val got = DeletionVectors.read(ManifestStore.snapshot(spark, root))
        .filter(col("doc_id") === vid).collect()
      assert(got.length === 1, "exactly one live row for the reinserted key")
      assert(got.head.getAs[Long]("n_chars") === 424242L,
        "the stale pre-delete payload must not resurrect")
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(victim)
    } finally Scratch.deleteRecursively(root)
  }

  test("N-batch churn: each merge APPENDS O(batch) vector bytes while " +
    "the vector grows — no O(|DV|) rewrite; compactDv collapses the pile") {
    val root = Scratch.tempDir("graft-merge-churn")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val dvName = DeletionVectors.dvTable(ManifestStore.MAIN)
      // seed a LARGE vector: 1/3 of the corpus DV-dead before the
      // churn starts — the r11 design re-wrote all of it every batch
      DeletionVectors.delete(spark, root, ManifestStore.MAIN, "doc_id",
        docs.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id")))
      val seeded = ManifestStore.snapshot(spark, root)
        .read(dvName).count()
      assert(seeded >= 100L, s"fixture too small to seed a vector ($seeded)")
      // five fixed-size delete batches (40 fresh ids each) through MERGE
      val perBatch = (0 until 5).map { i =>
        val prev = ManifestStore.snapshot(spark, root)
        val b = ev(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .orderBy("doc_id").limit(200).filter(
            pmod(col("doc_id"), lit(5)) === (i % 5).toLong), "D", 10 + i, 1)
        MergeInto.merge(spark, root, b, "churn", i.toLong)
        val cur = ManifestStore.snapshot(spark, root)
        val (added, removed) = ManifestStore.fileDiff(prev, cur, dvName)
        assert(removed.isEmpty,
          s"batch $i rewrote ${removed.map(_.path)} — the vector must " +
            "only be appended to")
        added.map(_.bytes).sum
      }
      // flat: every batch's appended run is batch-sized, not
      // vector-sized (the seeded vector alone is 10x a batch)
      assert(perBatch.max <= perBatch.min * 2 + 1024,
        s"per-batch DV bytes must stay flat at fixed batch size, got " +
          perBatch.mkString(","))
      // the pile collapses without touching data; reads are unchanged
      val before = canon(DeletionVectors.read(
        ManifestStore.snapshot(spark, root)))
      val dataBefore = ManifestStore.snapshot(spark, root).filePaths()
      DeletionVectors.compactDv(spark, root, ManifestStore.MAIN, "doc_id")
      val snap = ManifestStore.snapshot(spark, root)
      assert(snap.filePaths() === dataBefore,
        "compactDv must not touch one data file")
      assert(snap.state(dvName).partitions.values
        .map(_.files.length).sum === 1,
        "the compacted vector is one sorted run")
      assert(canon(DeletionVectors.read(snap)) === before)
      // appends after compaction still supersede: revive one victim
      val vic = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .orderBy("doc_id").limit(1).localCheckpoint(true)
      MergeInto.merge(spark, root,
        ev(vic.withColumn("n_chars", lit(777L)), "I", 99, 1), "churn", 99L)
      val got = DeletionVectors.read(ManifestStore.snapshot(spark, root))
        .filter(col("doc_id") === vic.head.getLong(0)).collect()
      assert(got.length === 1 && got.head.getAs[Long]("n_chars") === 777L)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(vic)
    } finally Scratch.deleteRecursively(root)
  }

  test("a partition emptied by moves is dropped from the manifest") {
    val root = Scratch.tempDir("graft-merge-empty")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val src0 = docs.select(min(col("source"))).head.getString(0)
      // move EVERY row of the smallest source elsewhere
      val move = ev(docs.filter(col("source") === src0)
        .withColumn("source", lit("elsewhere")), "U", 1, 1)
      MergeInto.merge(spark, root, move, "sink-c", 0L)
      val snap = ManifestStore.snapshot(spark, root)
      assert(!snap.state(ManifestStore.MAIN).partitions.values
        .exists(_.values == Seq(src0)),
        "the emptied source partition must leave the manifest")
      val expect = docs.withColumn("source",
        when(col("source") === src0, lit("elsewhere"))
          .otherwise(col("source")))
      assert(canon(DeletionVectors.read(snap)) === canon(expect))
    } finally Scratch.deleteRecursively(root)
  }
}
