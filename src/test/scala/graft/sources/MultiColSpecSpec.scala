package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-column partition-spec probes: box pruning is SOUND per axis
  * (≡ the plain filter, whatever mix of specs holds the rows),
  * SHARP on every axis an entry's own spec carries (a compound
  * entry prunes by any probed subset of its columns; an old-spec
  * entry prunes by the axes it has), and the residual predicate
  * exists in the plan ONLY while some entry misses a probed axis —
  * after migrateSpec the box read is the pure metadata prune.
  */
class MultiColSpecSpec extends SparkSpec {

  private def docs =
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars").cast("long").as("n_chars"))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("box probes: sound across specs, per-axis sharp, residual only " +
    "while mixed, pure prune after migrateSpec") {
    val root = Scratch.tempDir("graft-mcs")
    try {
      val gen1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val gen2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      ManifestStore.write(gen1, root, Seq("source"))                 // v1
      ManifestStore.evolvePartitionSpec(spark, root,
        ManifestStore.MAIN, Seq("source", "lang"))                   // v2
      ManifestStore.upsertPartitions(gen2, root, Seq("source", "lang")) // v3
      val v3 = ManifestStore.snapshot(spark, root)
      val src0 = docs.select(min(col("source"))).head.getString(0)
      val lang0 = docs.select(min(col("lang"))).head.getString(0)

      // soundness: box read ≡ plain filter, for a 2-axis box, a
      // 1-axis box on each column, and an empty-result box
      def expect(p: org.apache.spark.sql.Column) = docs.filter(p)
      assert(canon(v3.readPartitionBox(ManifestStore.MAIN,
        Seq("source" -> Seq(src0), "lang" -> Seq(lang0)))) ===
        canon(expect(col("source") === src0 && col("lang") === lang0)))
      assert(canon(v3.readPartitionBox(ManifestStore.MAIN,
        Seq("lang" -> Seq(lang0)))) === canon(expect(col("lang") === lang0)))
      assert(canon(v3.readPartitionBox(ManifestStore.MAIN,
        Seq("source" -> Seq(src0)))) === canon(expect(col("source") === src0)))
      assert(v3.readPartitionBox(ManifestStore.MAIN,
        Seq("source" -> Seq("no_such_source"))).count() === 0L)

      // per-axis sharpness: the source axis prunes BOTH generations
      // (old spec carries it; compound spec contains it), so kept
      // files = 1 old entry + the compound entries of src0
      val st = v3.state(ManifestStore.MAIN)
      val wantKept = st.partitions.values.count(p =>
        p.values(p.cols.indexOf("source")) == src0)
      val (kept, total) = v3.partitionProbeFilesBox(ManifestStore.MAIN,
        Seq("source" -> Set(src0)))
      assert(kept.length === wantKept && kept.length < total,
        s"source axis must prune both generations: $wantKept of $total")

      // a probed axis absent from an entry's spec cannot prune it:
      // the lang box keeps every old-spec file conservatively
      val nOld = st.partitions.values.count(_.cols == Seq("source"))
      val (keptL, _) = v3.partitionProbeFilesBox(ManifestStore.MAIN,
        Seq("lang" -> Set(lang0)))
      assert(keptL.count(f => st.partitions.values.exists(p =>
        p.cols == Seq("source") && p.files.contains(f))) === nOld)

      // mixed table: the residual isin IS in the plan (old-spec rows
      // need it); single-spec after migrateSpec: pure prune, no filter
      def planOf(df: DataFrame) = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      // the Filter OPERATOR, not the FileScan's "PushedFilters: []"
      // metadata string
      def hasFilterNode(plan: String) = plan.contains(" Filter (")
      val boxDf = v3.readPartitionBox(ManifestStore.MAIN,
        Seq("source" -> Seq(src0), "lang" -> Seq(lang0)))
      assert(hasFilterNode(planOf(boxDf)),
        "the mixed-spec box read needs its residual")
      ManifestStore.migrateSpec(spark, root)                         // v4
      val v4 = ManifestStore.snapshot(spark, root)
      val pure = v4.readPartitionBox(ManifestStore.MAIN,
        Seq("source" -> Seq(src0), "lang" -> Seq(lang0)))
      assert(!hasFilterNode(planOf(pure)),
        s"single-spec box read must be the pure metadata prune:\n" +
          planOf(pure).take(500))
      assert(canon(pure) ===
        canon(expect(col("source") === src0 && col("lang") === lang0)))
    } finally Scratch.deleteRecursively(root)
  }
}
