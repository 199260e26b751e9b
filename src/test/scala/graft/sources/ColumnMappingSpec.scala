package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Id-based column mapping (Delta's column-mapping / Iceberg field
  * ids): [[ManifestStore.renameColumn]] is metadata-only — every data
  * file carries stable field ids in its parquet schema, reads resolve
  * by id, so old generations serve the new name, new generations
  * write under it, time travel serves the old name, and a dropped
  * column's id is never recycled onto a later addition.
  */
class ColumnMappingSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text").as("content"),
        col("n_chars").cast("long").as("n_chars"))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("rename is metadata-only; both generations read under the new " +
    "name; time travel serves the old; writes continue under the new") {
    val root = Scratch.tempDir("graft-colmap")
    try {
      val gen1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val gen2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .withColumnRenamed("content", "body")
      ManifestStore.write(gen1, root, Seq("source"))                // v1
      val v1Files = ManifestStore.snapshot(spark, root).filePaths()
      ManifestStore.renameColumn(spark, root,
        ManifestStore.MAIN, "content", "body")                      // v2
      val v2 = ManifestStore.snapshot(spark, root)
      assert(v2.filePaths() === v1Files, "a rename must move no file")
      // the OLD generation's files now serve the NEW name — by id
      assert(canon(v2.read().select(col("doc_id"), col("body"))) ===
        canon(gen1.select(col("doc_id"), col("content").as("body"))))
      // writes continue under the new name; both generations union
      ManifestStore.append(gen2, root, Seq("source"))               // v3
      val v3 = ManifestStore.snapshot(spark, root)
      assert(canon(v3.read()) === canon(
        gen1.withColumnRenamed("content", "body").unionByName(gen2)))
      // the id map is stable across the rename: same id, new name
      val st1 = ManifestStore.snapshotAt(spark, root, 1)
        .state(ManifestStore.MAIN)
      val st3 = v3.state(ManifestStore.MAIN)
      assert(st3.fieldIds("body") === st1.fieldIds("content"))
      // time travel BEFORE the rename still serves the old name
      assert(ManifestStore.snapshotAt(spark, root, 1).read()
        .columns.contains("content"))
      assert(canon(ManifestStore.snapshotAt(spark, root, 1).read()) ===
        canon(gen1))
      // the whole thing survives a rename BACK
      ManifestStore.renameColumn(spark, root,
        ManifestStore.MAIN, "body", "content")                      // v4
      assert(canon(ManifestStore.snapshot(spark, root).read()) ===
        canon(gen1.unionByName(
          gen2.withColumnRenamed("body", "content"))))
    } finally Scratch.deleteRecursively(root)
  }

  test("guards: unknown/duplicate names and partition columns refuse; " +
    "a dropped column's id is never reused") {
    val root = Scratch.tempDir("graft-colmap-g")
    try {
      ManifestStore.write(docs, root, Seq("source"))
      intercept[IllegalArgumentException] {
        ManifestStore.renameColumn(spark, root,
          ManifestStore.MAIN, "nope", "x")
      }
      intercept[IllegalArgumentException] {
        ManifestStore.renameColumn(spark, root,
          ManifestStore.MAIN, "content", "n_chars")
      }
      intercept[IllegalArgumentException] {
        ManifestStore.renameColumn(spark, root,
          ManifestStore.MAIN, "source", "origin")
      }
      // drop `content` via Replace, then add a fresh column: the new
      // column must take a NEW id, not content's — recycling would
      // make old files serve content's bytes under the new name
      val cid = ManifestStore.snapshot(spark, root)
        .state(ManifestStore.MAIN).fieldIds("content")
      ManifestStore.write(docs.drop("content"), root, Seq("source"))
      ManifestStore.write(
        docs.drop("content").withColumn("grade", col("n_chars") % 7),
        root, Seq("source"))
      val st = ManifestStore.snapshot(spark, root)
        .state(ManifestStore.MAIN)
      assert(st.fieldIds("grade") !== cid,
        "a dropped column's id must never be recycled")
      assert(st.fieldIds("doc_id") === 1,
        "surviving columns keep their original ids across Replace")
    } finally Scratch.deleteRecursively(root)
  }

  test("the mapping survives checkpoint replay and feeds the logical " +
    "change feed across a rename") {
    val root = Scratch.tempDir("graft-colmap-ck")
    try {
      val gen1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      ManifestStore.write(gen1, root, Seq("source"))
      ManifestStore.renameColumn(spark, root,
        ManifestStore.MAIN, "content", "body")
      (0 until ManifestStore.CKPT_EVERY).foreach { i =>
        ManifestStore.append(
          gen1.limit(3)
            .withColumn("doc_id", col("doc_id") + lit(1000000L * (i + 1)))
            .withColumnRenamed("content", "body"),
          root, Seq("source"))
      }
      ManifestStore.awaitCheckpoints()
      val cur = ManifestStore.snapshot(spark, root)
      assert(cur.state(ManifestStore.MAIN).fieldIds.contains("body"))
      assert(cur.read().count() ===
        gen1.count() + 3L * ManifestStore.CKPT_EVERY)
      // the DV-aware feed reads delta files through the id mapping:
      // the v2→v3 hop (first append AFTER the rename) classifies the
      // three inserts, payloads intact
      val feed = DeletionVectors.logicalFeed(spark, root,
        ManifestStore.snapshotAt(spark, root, 2),
        ManifestStore.snapshotAt(spark, root, 3))
      assert(feed.filter(col("op") === "insert").count() === 3L)
    } finally Scratch.deleteRecursively(root)
  }
}
