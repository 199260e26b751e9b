package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The transactional contract [[ManifestStore]] exists for: commits
  * publish through ONE atomic manifest swap, so a reader sees a
  * complete committed version — old or new, never partial, and never
  * a store/sidecar pair from two different commits; a crash after any
  * subset of staged writes leaves the previous consistent pair
  * visible; superseded files survive until vacuum (reader isolation),
  * then go.
  */
class ManifestStoreSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"), col("source"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("round-trip, manifest-level pruning, and stats") {
    val root = Scratch.tempDir("graft-mstore")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val snap = ManifestStore.snapshot(spark, root)
      assert(snap.version === 1L)
      assert(canon(snap.read()) === canon(docs))

      val some = docs.select("source").distinct().limit(1)
        .collect()(0).getString(0)
      val pruned = snap.readPartitions(ManifestStore.MAIN, Seq(some))
      assert(canon(pruned) === canon(docs.filter(col("source") === some)))
      // pruning evidence: the scan's input files are EXACTLY the
      // manifest's files for that partition — pruned before Spark
      // ever listed a directory
      // root-relative comparison: one coalesced write task gives every
      // partition dir the SAME part-file basename
      val wantFiles = snap.state(ManifestStore.MAIN)
        .partitions.values.filter(_.values.head == some)
        .flatMap(_.files.map(_.path)).toSet
      val gotFiles = pruned.inputFiles
        .map(f => f.substring(f.indexOf("_data/"))).toSet
      assert(gotFiles === wantFiles)

      // manifest stats match the data without scanning it
      assert(snap.totalRows() === docs.count())
      val bySource = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      snap.partitionStats().foreach { case (v, nf, rows, bytes) =>
        assert(rows === bySource(v), s"partition $v")
        assert(nf >= 1 && bytes > 0)
      }
    } finally Scratch.deleteRecursively(root)
  }

  test("upsert touches only its partitions; old snapshot stays readable") {
    val root = Scratch.tempDir("graft-mstore-up")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val v1 = ManifestStore.snapshot(spark, root)
      val sources = docs.select("source").distinct().collect()
        .map(_.getString(0)).sorted
      assert(sources.length > 1)
      val target = sources.head
      val batch = docs
        .filter(col("source") === target)
        .withColumn("n_chars", col("n_chars") + 1000000L)
      ManifestStore.upsertPartitions(batch, root, Seq("source"))

      val v2 = ManifestStore.snapshot(spark, root)
      assert(v2.version === 2L)
      // untouched partitions keep the IDENTICAL file paths — stronger
      // than byte-identity: the commit never rewrote them at all
      def untouched(s: ManifestStore.Snapshot) =
        s.state(ManifestStore.MAIN).partitions
          .filter(_._2.values.head != target)
      assert(untouched(v2) === untouched(v1))
      // merged read-back = old ∪ new
      val expect = docs.filter(col("source") =!= target).unionByName(batch)
      assert(canon(v2.read()) === canon(expect))
      // the PRE-commit snapshot still reads the PRE-commit content:
      // superseded files are not deleted at commit — that window IS
      // the mid-rewrite reader's isolation
      assert(canon(v1.read()) === canon(docs))
    } finally Scratch.deleteRecursively(root)
  }

  test("store+sidecar publish as ONE commit; a crash between staged writes leaves the old pair") {
    val root = Scratch.tempDir("graft-mstore-pair")
    try {
      val store0 = docs.withColumn("v", lit(1L))
      val index0 = docs.select(col("doc_id"), col("source"))
        .withColumn("v", lit(1L))
      ManifestStore.commit(spark, root, Seq(
        ManifestStore.stage(store0, root, "store", Seq("source"),
          ManifestStore.Replace),
        ManifestStore.stage(index0, root, "index", Seq("source"),
          ManifestStore.Replace)
      ))

      // "crash" after the store's files hit disk, before the sidecar's:
      // stage without committing — the manifest must still resolve the
      // v=1 pair for BOTH tables
      ManifestStore.stage(store0.withColumn("v", lit(2L)), root, "store",
        Seq("source"), ManifestStore.Upsert)
      val mid = ManifestStore.snapshot(spark, root)
      assert(mid.version === 1L)
      assert(mid.read("store").select("v").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(1L))
      assert(mid.read("index").select("v").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(1L))

      // the completed commit swaps both tables at once
      ManifestStore.commit(spark, root, Seq(
        ManifestStore.stage(store0.withColumn("v", lit(2L)), root, "store",
          Seq("source"), ManifestStore.Upsert),
        ManifestStore.stage(index0.withColumn("v", lit(2L)), root, "index",
          Seq("source"), ManifestStore.Upsert)
      ))
      val after = ManifestStore.snapshot(spark, root)
      assert(after.version === 2L)
      Seq("store", "index").foreach { t =>
        assert(after.read(t).select("v").distinct().collect()
          .map(_.getLong(0)).toSeq === Seq(2L), t)
      }
    } finally Scratch.deleteRecursively(root)
  }

  test("a reader racing commits sees one committed version across both tables — never partial") {
    val root = Scratch.tempDir("graft-mstore-race")
    try {
      val base = docs.limit(200).localCheckpoint(true)
      def tagged(v: Long) = base.withColumn("v", lit(v))
      ManifestStore.commit(spark, root, Seq(
        ManifestStore.stage(tagged(1), root, "store", Seq("source"),
          ManifestStore.Replace),
        ManifestStore.stage(tagged(1), root, "index", Seq("source"),
          ManifestStore.Replace)
      ))
      val rounds = 6
      @volatile var done = false
      @volatile var failure: Option[String] = None
      val reader = new Thread(() =>
        try {
          while (!done) {
            val s = ManifestStore.snapshot(spark, root)
            val vs = s.read("store").unionByName(s.read("index"))
              .select("v").distinct().collect().map(_.getLong(0)).toSeq
            if (vs.length != 1)
              failure = Some(s"snapshot v${s.version} mixed versions: $vs")
            if (vs.head != s.version)
              failure = Some(s"manifest v${s.version} served rows v=$vs")
          }
        } catch { case e: Throwable => failure = Some(e.toString) })
      reader.start()
      try
        (2 to rounds).foreach { v =>
          ManifestStore.commit(spark, root, Seq(
            ManifestStore.stage(tagged(v.toLong), root, "store",
              Seq("source"), ManifestStore.Upsert),
            ManifestStore.stage(tagged(v.toLong), root, "index",
              Seq("source"), ManifestStore.Upsert)
          ))
        }
      finally { done = true; reader.join(60000) }
      assert(failure.isEmpty, failure)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(base)
    } finally Scratch.deleteRecursively(root)
  }

  test("append grows the file list; vacuum drops exactly the unreferenced files") {
    val root = Scratch.tempDir("graft-mstore-app")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      val filesV1 = ManifestStore.snapshot(spark, root)
        .state(ManifestStore.MAIN).partitions.values.map(_.files.length).sum
      // materialized: limit-without-order must not re-pick rows
      // between the append and the expected-count read below
      val extra = docs.limit(50)
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .localCheckpoint(true)
      ManifestStore.append(extra, root, Seq("source"))
      val v2 = ManifestStore.snapshot(spark, root)
      val filesV2 = v2.state(ManifestStore.MAIN)
        .partitions.values.map(_.files.length).sum
      assert(filesV2 > filesV1, "append must add files, not rewrite")
      assert(v2.read().count() === docs.count() + 50)

      // a superseding upsert leaves v2's files on disk...
      val target = docs.select("source").distinct().limit(1)
        .collect()(0).getString(0)
      ManifestStore.upsertPartitions(
        docs.filter(col("source") === target), root, Seq("source"))
      val v3 = ManifestStore.snapshot(spark, root)
      // ...until vacuum removes whatever v3 does not reference
      val removed = ManifestStore.vacuum(spark, root)
      assert(removed > 0, "the superseded upsert files must be collectable")
      assert(v3.read().count() ===
        docs.count() + 50 - extra.filter(col("source") === target).count(),
        "the current version must survive vacuum intact")
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(extra)
    } finally Scratch.deleteRecursively(root)
  }

  test("an empty table reads back as its schema with zero rows") {
    val root = Scratch.tempDir("graft-mstore-empty")
    try {
      ManifestStore.write(docs.limit(0), root, Seq.empty)
      val back = ManifestStore.read(spark, root)
      assert(back.count() === 0L)
      assert(back.schema.fieldNames.toSeq ===
        Seq("doc_id", "n_chars", "source"))
    } finally Scratch.deleteRecursively(root)
  }
}
