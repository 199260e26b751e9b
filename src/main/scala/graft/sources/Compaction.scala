package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPTIMIZE action that executes q86's
  * bin-pack plan against a [[PartitionedStore]] instead of only
  * reporting it (the q101→q102 promote-the-spec discipline applied to
  * layout maintenance).
  *
  * The three parts mirror how a table format runs OPTIMIZE:
  *   - [[plan]]: the streaming binning q86 reports — within a
  *     partition, files in id order get `bin = cum_before DIV target`
  *     (a bin closes once the running total crosses the target; the
  *     threshold-crossing bin may exceed it by one trailing file).
  *   - [[writeBinned]]: one OUTPUT FILE per (partition, bin), exact —
  *     each bin is its own reduce task via an explicit Partitioner
  *     (hash placement cannot promise one-file-per-bin: two bins
  *     landing in one task merge into one oversized file). This is
  *     the bin→task shape Delta/Iceberg OPTIMIZE use; the keyed RDD
  *     hop exists ONLY because DataFrame repartition exposes no exact
  *     key→partition placement.
  *   - [[execute]]: rewrite ONLY the partitions the plan names, via
  *     dynamic partition overwrite — every other partition's files
  *     stay byte-identical on disk. The rewrite frame is validated
  *     BEFORE commit (the cdc15/cdc16 discipline): it must cover
  *     exactly the touched partitions' rows, else the overwrite would
  *     silently drop the files the plan missed.
  *
  * Scale posture: the plan and the key→task index are manifest-sized
  * (files and bins, not rows); the rewrite shuffles only the touched
  * partitions' data, once, directly into its final file layout.
  */
object Compaction {

  /** Assign each file to a compaction bin: `files` must carry
    * (partitionCol, fileCol, bytesCol); returns the same frame plus
    * `cum_before` and `bin`. One definition shared by the q86 report
    * and the q109 execution.
    */
  def plan(
      files: DataFrame,
      partitionCol: String,
      fileCol: String,
      bytesCol: String,
      target: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = Window
      .partitionBy(partitionCol)
      .orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col(bytesCol)).over(ws), lit(0L)))
      .withColumn("bin", expr(s"cum_before DIV $target"))
  }

  /** Write `df` partitioned by `partitionCol` with EXACTLY one file
    * per distinct (partitionCol, binCol) value: the distinct bin keys
    * (manifest-sized) are collected and each key pinned to its own
    * reduce task, so each task writes one file into one partition
    * directory. The files land in an unreferenced staging dir and
    * publish through ONE atomic [[ManifestStore]] commit:
    * `dynamic = true` replaces only the partitions present in `df`
    * (Upsert), `false` installs the frame as the table (Replace) —
    * either way a concurrent reader resolves the previous complete
    * version until the swap.
    */
  def writeBinned(
      df: DataFrame,
      path: String,
      partitionCol: String,
      binCol: String,
      dynamic: Boolean,
      expectedVersion: Long = ManifestStore.ANY_VERSION
  ): Unit = {
    val spark = df.sparkSession
    val keyed = df.withColumn(
      "__ckey",
      concat_ws(
        "\u0001",
        col(partitionCol).cast("string"),
        col(binCol).cast("string")
      )
    )
    val keys = keyed
      .select(col("__ckey"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
    val idx: Map[String, Int] = keys.zipWithIndex.toMap
    val n = math.max(idx.size, 1)
    val schema = keyed.schema
    val ki = schema.fieldIndex("__ckey")
    val placed = keyed.rdd
      .map(r => (r.getString(ki), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int =
          idx(key.asInstanceOf[String])
      })
      .map(_._2)
    val staging = ManifestStore.stageDir(path, ManifestStore.MAIN)
    ManifestStore.tagForStage(
      spark
        .createDataFrame(placed, schema)
        .drop("__ckey"),
      path, ManifestStore.MAIN)
      // the real column stays in the data; the write partitions on a
      // duplicate (the ManifestStore layout contract)
      .withColumn(s"__p_$partitionCol", col(partitionCol))
      .write
      .partitionBy(s"__p_$partitionCol")
      .mode("overwrite")
      .parquet(staging)
    ManifestStore.commit(spark, path, Seq(ManifestStore.Staged(
      ManifestStore.MAIN,
      staging,
      Seq(partitionCol),
      df.schema.toDDL,
      if (dynamic) ManifestStore.Upsert else ManifestStore.Replace
    )), expectedVersion)
  }

  /** Execute a bin plan against the store at `path`: `binPlan` maps
    * (partitionCol, keyCols...) → `bin` for EVERY file of every
    * partition it intends to rewrite; partitions absent from the plan
    * are untouched on disk. Fails (before any write) if the plan does
    * not cover all rows of a touched partition — a partial plan would
    * otherwise drop the uncovered files in the overwrite. The store
    * is materialized (localCheckpoint) before the self-overwrite and
    * the checkpoint is released after the commit.
    *
    * The rewrite is a read-modify-write, so the commit is PINNED to
    * the manifest version the read resolved (compare-and-swap): a
    * concurrent ingest landing in a touched partition between read
    * and commit would otherwise be silently dropped by the partition
    * overwrite — instead the commit throws
    * [[ManifestStore.ConcurrentCommitException]] with nothing
    * published, and the caller re-plans from the fresh manifest (the
    * OPTIMIZE-vs-ingest race every table format resolves this way).
    */
  def execute(
      spark: SparkSession,
      path: String,
      partitionCol: String,
      keyCols: Seq[String],
      binPlan: DataFrame
  ): Unit = {
    val snap = ManifestStore.snapshot(spark, path)
    // the plan's binning supersedes whatever binning rides the store
    // (a planted store carries bin = its ingest file; a previously
    // compacted store carries the last plan's bins)
    val store = snap.read().drop("bin")
    val planSlim =
      binPlan.select((partitionCol +: keyCols :+ "bin").map(col): _*)
    val frame = store
      .join(broadcast(planSlim), partitionCol +: keyCols)
      .localCheckpoint(true)
    try {
      val touched = planSlim.select(col(partitionCol)).distinct()
      val expected = store
        .join(broadcast(touched), Seq(partitionCol), "left_semi")
        .count()
      require(
        frame.count() == expected,
        s"compaction plan does not cover every file of its touched " +
          s"partitions (covered ${frame.count()} of $expected rows) — " +
          "refusing a rewrite that would drop data"
      )
      writeBinned(frame, path, partitionCol, "bin", dynamic = true,
        expectedVersion = snap.version)
    } finally
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(frame)
  }
}
