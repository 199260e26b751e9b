package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DV-aware logical feed's defining property: for ANY pair of
  * versions, [[DeletionVectors.logicalFeed]] (which reads only
  * changed files + DV-diff candidate files) classifies EXACTLY the
  * same rows as the brute-force diff of the two merge-on-read states
  * (which reads both stores whole). Pinned under mixed churn — file
  * updates, DV deletes, materialization, and appends in one history —
  * including the telescoping skip-level hop.
  */
class DvFeedSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))

  /** Brute-force oracle: full-outer diff of the two LOGICAL states. */
  private def bruteFeed(a: ManifestStore.Snapshot, b: ManifestStore.Snapshot): DataFrame = {
    def logical(s: ManifestStore.Snapshot) =
      DeletionVectors.read(s).select(col("doc_id"), col("n_chars"))
    logical(b).select(col("doc_id"), col("n_chars").as("payload_new"))
      .join(logical(a).select(col("doc_id"), col("n_chars").as("payload_old")),
        Seq("doc_id"), "full_outer")
      .withColumn("op",
        when(col("payload_old").isNull, lit("insert"))
          .when(col("payload_new").isNull, lit("delete"))
          .when(col("payload_new") =!= col("payload_old"), lit("update")))
      .filter(col("op").isNotNull)
      .select(col("doc_id"), col("payload_new"), col("payload_old"), col("op"))
  }

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("logicalFeed ≡ brute-force logical diff across a mixed history") {
    val root = Scratch.tempDir("graft-dvfeed")
    try {
      ManifestStore.write(docs, root, Seq("bucket"))               // v1
      // v2: file churn (bucket 0 payloads shift) AND a DV delete in
      // bucket 1 — both change classes in one commit window
      ManifestStore.upsertPartitions(
        docs.filter(col("bucket") === 0)
          .withColumn("n_chars", col("n_chars") + lit(1000000L)),
        root, Seq("bucket"))
      DeletionVectors.delete(spark, root, ManifestStore.MAIN, "doc_id", // v3
        docs.filter(col("doc_id") >= 120 && col("doc_id") <= 140)
          .select(col("doc_id")))
      DeletionVectors.materialize(spark, root, ManifestStore.MAIN,  // v4
        "doc_id")
      ManifestStore.append(                                         // v5
        docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .withColumn("doc_id", col("doc_id") + lit(5000000L))
          .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)")),
        root, Seq("bucket"))

      def snap(v: Long) = ManifestStore.snapshotAt(spark, root, v)
      // every consecutive hop + two skip-level hops telescope
      val hops = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L), (2L, 4L))
      hops.foreach { case (a, b) =>
        val got = DeletionVectors.logicalFeed(spark, root, snap(a), snap(b))
        assert(canon(got) === canon(bruteFeed(snap(a), snap(b))),
          s"hop v$a -> v$b")
      }
      // the semantics worth naming: materialization (v3 -> v4) is
      // logically SILENT, the DV commit (v2 -> v3) is exactly the
      // delete set with pre-delete payloads
      assert(DeletionVectors.logicalFeed(spark, root, snap(3), snap(4))
        .count() === 0L, "materialize must announce nothing")
      val announce = DeletionVectors.logicalFeed(spark, root, snap(2), snap(3))
        .collect()
      assert(announce.forall(_.getAs[String]("op") == "delete"))
      assert(announce.map(_.getLong(0)).sorted.toSeq === (120L to 140L))
    } finally Scratch.deleteRecursively(root)
  }

  /** Largest In/InSet literal list anywhere in the plan — the
    * scale-killer being pinned out of existence: a feed that expands
    * the delete-id set into plan literals shows up here at O(ids).
    */
  private def maxInLiterals(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    val sizes = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case i: In    => i.list.size
        case i: InSet => i.hset.size
      })
    }.flatten
    if (sizes.isEmpty) 0 else sizes.max
  }

  test("mass delete (>=10k ids): the feed carries the id set " +
    "relationally — no O(ids) plan literals, classification exact") {
    val root = Scratch.tempDir("graft-dvfeed-mass")
    try {
      // 40 shifted copies of the fixture corpus: 20k distinct ids in
      // id-clustered buckets (the RTBF-at-scale shape — a purge of an
      // entire crawl source, ids scattered across the store)
      val wide = (0 until 40).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(500L * i))
      }.reduce(_ unionByName _)
        .withColumn("bucket", expr("CAST(doc_id DIV 100 AS BIGINT)"))
        .localCheckpoint(true)
      ManifestStore.write(wide, root, Seq("bucket"))                // v1
      DeletionVectors.delete(spark, root, ManifestStore.MAIN, "doc_id",
        wide.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select(col("doc_id")))                                   // v2
      def snap(v: Long) = ManifestStore.snapshotAt(spark, root, v)
      val feed = DeletionVectors.logicalFeed(spark, root, snap(1), snap(2))
      assert(maxInLiterals(feed) <= ManifestStore.ISIN_MAX,
        "a 10^4-id delete must not expand into In/InSet plan literals")
      val got = feed.agg(
        count(lit(1)), sum(col("doc_id")),
        sum(when(col("op") === "delete", 1).otherwise(0))).head
      assert(got.getLong(0) === 10000L, "every even id announced once")
      assert(got.getLong(2) === 10000L, "all classified delete")
      assert(got.getLong(1) === (0L until 20000L by 2).sum)
      // and the relational path agrees with the brute-force diff
      assert(canon(feed) === canon(bruteFeed(snap(1), snap(2))))
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(wide)
    } finally Scratch.deleteRecursively(root)
  }
}
