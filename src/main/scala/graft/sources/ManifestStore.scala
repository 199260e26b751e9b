package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Manifest-committed multi-table store — the transactional primitive
  * [[PartitionedStore]] lacks: writers stage new files under paths no
  * reader resolves, then publish by atomically swapping ONE manifest
  * file; readers resolve every file through the manifest, so a read
  * observes a complete committed version or the previous one — never
  * a half-rewritten store, and never a store/sidecar pair from two
  * different commits (one manifest covers ALL tables of the root, so
  * a store + its index publish as a single commit). This is the core
  * of every production table format (Delta's `_delta_log`, Iceberg's
  * snapshot + manifest lists) re-expressed at its minimum: on an
  * object store the swap becomes a conditional PUT / metastore CAS;
  * on the local filesystem it is `Files.move(ATOMIC_MOVE)` — rename(2),
  * atomic by POSIX contract.
  *
  * Layout under a root:
  * {{{
  *   _graft/MANIFEST.json            the one swap target
  *   _data/c<uuid>/<table>/__p_<col>=<v>/part-*.parquet
  * }}}
  * Both top-level names start with `_`, so a raw parquet read of the
  * root sees nothing — there IS no path to the data except through
  * the manifest. Partition columns stay in the data files (the write
  * partitions by a `__p_`-prefixed duplicate), so partition pruning
  * is a MANIFEST lookup — the file list is pruned before Spark ever
  * lists a directory, strictly earlier than Hive-layout
  * `PartitionFilters` — and readers still get row-group pruning from
  * the retained data column.
  *
  * Commits never delete data files: superseded versions stay on disk
  * until [[vacuum]], which is what isolates an in-flight reader that
  * resolved the previous manifest. Crash-safety falls out of the same
  * order: staging is invisible, so a crash after any subset of staged
  * writes — e.g. after the store's files, before the sidecar's —
  * leaves the manifest pointing at the old, mutually-consistent pair.
  *
  * Beyond the swap, the manifest carries the rest of the table-format
  * core, each a metadata-only read:
  *   - every committed version also persists as `_graft/v%06d.json`,
  *     so [[snapshotAt]] TIME-TRAVELS to any retained version and
  *     [[changedPartitions]] diffs two versions file-granularly (the
  *     change-data-feed read touches ONLY files added/removed between
  *     the versions, never the whole store);
  *   - [[commit]] takes an `expectedVersion` — compare-and-swap, the
  *     optimistic concurrency every multi-writer table needs (in-JVM
  *     the check runs under a per-root lock; on an object store it IS
  *     the conditional PUT); [[commitRebase]] retries a lost race
  *     when the staged partitions are disjoint from what landed in
  *     between, and refuses (never silently merges) when they overlap;
  *   - [[commitBatch]] records a (sink, batchId) ledger IN the
  *     manifest, so a streaming `foreachBatch` sink re-delivered a
  *     batch after a crash publishes exactly once — the ledger and
  *     the data commit share the single swap;
  *   - [[FileEntry]] carries per-file min/max for integral columns
  *     (read from the parquet footers at commit time), so
  *     [[Snapshot.readRange]] prunes files by value range BEFORE
  *     Spark lists anything — manifest-level data skipping on
  *     non-partition columns.
  */
object ManifestStore {

  /** A commit lost the optimistic-concurrency race: the manifest
    * version moved past `expectedVersion` (or past a rebase's
    * conflict window) between stage and swap.
    */
  final class ConcurrentCommitException(msg: String)
      extends RuntimeException(msg)

  /** Per-root in-JVM commit lock — the local stand-in for an object
    * store's conditional PUT: version check and swap are one critical
    * section, so two racing committers serialize and the loser's
    * expectedVersion check fails deterministically.
    */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  /** The main table's name — single-table callers never spell it. */
  val MAIN = "store"

  /** [[commit]]'s `expectedVersion` sentinel: skip the CAS check. */
  val ANY_VERSION: Long = -1L

  sealed trait Mode

  /** Install the staged files as the table's complete content. */
  case object Replace extends Mode

  /** Replace exactly the partitions present in the staged write; all
    * other partitions keep their current files (the
    * [[PartitionedStore.overwritePartitions]] contract, made atomic).
    */
  case object Upsert extends Mode

  /** Add the staged files to their partitions' current file lists —
    * the ingest shape that manufactures small files (cdc18 plants its
    * compaction pathology through this).
    */
  case object Append extends Mode

  /** One parquet file the manifest references: `path` relative to the
    * root, plus the stats every planner wants — bytes from the file
    * status, rows from the parquet footer, and per-column (min, max)
    * for the file's integral columns (footer column statistics
    * aggregated across row groups — metadata, not data). A column
    * absent from `stats` simply cannot prune this file.
    */
  final case class FileEntry(
      path: String,
      bytes: Long,
      rows: Long,
      stats: Map[String, (Long, Long)] = Map.empty
  )

  final case class PartitionEntry(values: Seq[String], files: Seq[FileEntry]) {
    def rows: Long = files.map(_.rows).sum
    def bytes: Long = files.map(_.bytes).sum
  }

  final case class TableState(
      partitionCols: Seq[String],
      schemaDdl: String,
      partitions: Map[String, PartitionEntry]
  )

  /** A staged-but-unpublished write: files exist on disk under
    * `dir` (unreferenced by any manifest), nothing is visible until
    * [[commit]] swaps them in.
    */
  final case class Staged(
      table: String,
      dir: String,
      partitionCols: Seq[String],
      schemaDdl: String,
      mode: Mode
  )

  /** One parsed manifest: every read through the same snapshot sees
    * one committed version across ALL tables — the isolation unit.
    */
  final class Snapshot private[ManifestStore] (
      val spark: SparkSession,
      val root: String,
      val version: Long,
      val tables: Map[String, TableState],
      val batches: Map[String, Long] = Map.empty
  ) {
    def hasTable(table: String): Boolean = tables.contains(table)

    private def resolve(files: Seq[FileEntry]): Seq[(String, Long)] =
      files.map(f => (root + "/" + f.path, f.bytes))

    /** Every read resolves through the manifest's OWN metadata: the
      * (path, bytes) pairs feed a caller-provided FileIndex, so a read
      * costs ZERO filesystem list/stat calls — `spark.read.parquet`
      * with explicit paths re-stats each file on the driver per read,
      * an O(files) IO round the manifest already paid at commit time.
      */
    private def readFiles(st: TableState, files: Seq[(String, Long)]): DataFrame = {
      val schema = StructType.fromDDL(st.schemaDdl)
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          schema
        )
      else
        org.apache.spark.sql.graftshim.GraftSqlShims
          .readParquetKnownFiles(spark, schema, files)
    }

    def read(table: String = MAIN): DataFrame = {
      val st = state(table)
      readFiles(st, resolve(st.partitions.values.flatMap(_.files).toSeq))
    }

    /** Manifest-level partition pruning: only the named partitions'
      * files reach the scan — the reader never lists, let alone
      * opens, any other partition's files. `values` match on the
      * stringified partition value (single partition column).
      */
    def readPartitions(table: String, values: Seq[Any]): DataFrame = {
      val st = state(table)
      require(st.partitionCols.length == 1,
        s"readPartitions prunes on a single partition column, " +
          s"'$table' has ${st.partitionCols.mkString(",")}")
      val want = values.map(_.toString).toSet
      val files = st.partitions.collect {
        case (_, p) if want.contains(p.values.head) => p.files
      }.flatten.toSeq
      readFiles(st, resolve(files))
    }

    def state(table: String): TableState =
      tables.getOrElse(
        table,
        throw new IllegalArgumentException(
          s"no table '$table' in manifest v$version at $root " +
            s"(tables: ${tables.keys.toSeq.sorted.mkString(",")})"
        )
      )

    /** Per-partition (value, nFiles, rows, bytes) — the driver-side
      * stats read that replaces full-scan counts (a rebalance's
      * `total`, q86's file census) with manifest metadata.
      */
    def partitionStats(table: String = MAIN): Seq[(String, Int, Long, Long)] =
      state(table).partitions.values
        .map(p => (p.values.mkString("/"), p.files.length, p.rows, p.bytes))
        .toSeq
        .sortBy(_._1)

    def totalRows(table: String = MAIN): Long =
      state(table).partitions.values.map(_.rows).sum

    /** Root-relative paths of the table's current files. */
    def filePaths(table: String = MAIN): Seq[String] =
      state(table).partitions.values.flatMap(_.files.map(_.path)).toSeq.sorted

    /** (partition value string, root-relative path, bytes, rows) per
      * current file — the manifest AS a table, for file-census
      * queries (q86's production input).
      */
    def fileStats(table: String = MAIN): Seq[(String, String, Long, Long)] =
      state(table).partitions.values.flatMap { p =>
        p.files.map(f => (p.values.mkString("/"), f.path, f.bytes, f.rows))
      }.toSeq.sortBy(_._2)

    /** Manifest-level data skipping on NON-partition columns: the
      * files whose footer (min, max) intersects EVERY (column, lo,
      * hi) range, plus the table's total file count. A file without
      * stats for a column is conservatively kept by that column.
      */
    def prunedFiles(
        table: String,
        ranges: Seq[(String, Long, Long)]
    ): (Seq[FileEntry], Int) = {
      val all = state(table).partitions.values.flatMap(_.files).toSeq
      val kept = all.filter { f =>
        ranges.forall { case (c, lo, hi) =>
          f.stats.get(c) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None           => true
          }
        }
      }
      (kept, all.length)
    }

    def rangeFiles(
        table: String,
        column: String,
        lo: Long,
        hi: Long
    ): (Seq[FileEntry], Int) = prunedFiles(table, Seq((column, lo, hi)))

    /** Box read through the stats: scan ONLY the files [[prunedFiles]]
      * keeps, with the residual predicates still applied — result is
      * identical to filtering the full table, minus the skipped IO.
      */
    def readBox(table: String, ranges: Seq[(String, Long, Long)]): DataFrame = {
      val (kept, _) = prunedFiles(table, ranges)
      ranges.foldLeft(readFiles(state(table), resolve(kept))) {
        case (df, (c, lo, hi)) => df.filter(col(c) >= lo && col(c) <= hi)
      }
    }

    def readRange(table: String, column: String, lo: Long, hi: Long): DataFrame =
      readBox(table, Seq((column, lo, hi)))
  }

  private def manifestDir(root: String) = root + "/_graft"
  private def manifestPath(root: String) = manifestDir(root) + "/MANIFEST.json"
  private def versionPath(root: String, v: Long) =
    manifestDir(root) + f"/v$v%06d.json"

  /** Local filesystem path of a possibly `file:`-prefixed root. */
  private def localPath(p: String): java.nio.file.Path = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    require(u.getScheme == null || u.getScheme == "file",
      s"ManifestStore's atomic swap is local-filesystem (rename(2)); " +
        s"an object store deployment swaps via conditional PUT: $p")
    java.nio.file.Paths.get(u.getPath)
  }

  def exists(spark: SparkSession, root: String): Boolean =
    java.nio.file.Files.exists(localPath(manifestPath(root)))

  // ---------------------------------------------------------------
  // Staging
  // ---------------------------------------------------------------

  private def newCommitDir(root: String, table: String): String =
    s"$root/_data/c${java.util.UUID.randomUUID().toString.take(8)}/$table"

  /** Physically write `df`'s files under a fresh, unreferenced commit
    * directory — clustered by the partition columns so each partition
    * lands as one file per holding shuffle task, partitioned on disk
    * by `__p_` duplicates so the REAL columns stay in the data. No
    * reader can observe anything until [[commit]].
    */
  def stage(
      df: DataFrame,
      root: String,
      table: String,
      partitionCols: Seq[String],
      mode: Mode
  ): Staged = {
    val dir = newCommitDir(root, table)
    val dups = partitionCols.map("__p_" + _)
    val withDups = partitionCols.foldLeft(df)((d, c) =>
      d.withColumn("__p_" + c, col(c)))
    val clustered =
      if (partitionCols.nonEmpty)
        withDups.repartition(partitionCols.map(col): _*)
      else withDups
    val writer = clustered.write.mode("overwrite")
    (if (dups.nonEmpty) writer.partitionBy(dups: _*) else writer).parquet(dir)
    Staged(table, dir, partitionCols, df.schema.toDDL, mode)
  }

  /** A fresh unreferenced directory for callers that run their own
    * physical write (exact file placement — [[Compaction.writeBinned]]);
    * pair with [[Staged]] and [[commit]].
    */
  def stageDir(root: String, table: String): String =
    newCommitDir(root, table)

  // ---------------------------------------------------------------
  // Commit
  // ---------------------------------------------------------------

  /** Decode the `%xx` escapes Spark's partitioned write applies to
    * special characters in partition-directory values.
    */
  private def unescape(s: String): String = {
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '%' && i + 2 < s.length) {
          // %xx — two hex digits follow by construction of the escape
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }

  /** List one staged directory's parquet files, grouped by partition
    * values parsed from the `__p_<col>=<v>` path segments. Driver-side
    * and manifest-sized; rows come from each file's parquet footer
    * (metadata, never a data scan).
    */
  private def listStaged(
      spark: SparkSession,
      root: String,
      st: Staged
  ): Map[String, PartitionEntry] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootUri = new org.apache.hadoop.fs.Path(root).toUri.getPath
    // NIO walk, not fs.listFiles(recursive): the store is local-FS by
    // contract (the atomic rename), and Hadoop's recursive listing
    // paid ~4 ms/file on exactly the small-file plants the compaction
    // rows stage (measured 2.7 s for 640 files — the commit's
    // dominant cost); the walk is microseconds per file
    val statuses: Seq[org.apache.hadoop.fs.FileStatus] = {
      import scala.jdk.CollectionConverters._
      val dirNio = localPath(st.dir)
      if (!java.nio.file.Files.exists(dirNio)) Seq.empty
      else {
        val walk = java.nio.file.Files.walk(dirNio)
        try walk.iterator().asScala.flatMap { p =>
          val name = p.getFileName.toString
          if (java.nio.file.Files.isRegularFile(p) &&
            name.endsWith(".parquet") &&
            !name.startsWith("_") && !name.startsWith("."))
            Some(new org.apache.hadoop.fs.FileStatus(
              java.nio.file.Files.size(p), false, 1, 128L * 1024 * 1024,
              0L, new org.apache.hadoop.fs.Path(p.toUri)))
          else None
        }.toVector
        finally walk.close()
      }
    }
    // footer reads are independent IO — a small-file plant stages
    // hundreds of them, and opening each serially on the driver turns
    // an O(files) metadata pass into the commit's dominant cost (the
    // r9 A/B caught compaction at 3× for exactly this)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, Runtime.getRuntime.availableProcessors())))
    // Hadoop Configuration is internally synchronized — sharing one
    // across the pool serializes the footer readers (measured: the
    // pool bought nothing); each thread gets its own copy
    val localConf = ThreadLocal.withInitial(
      new java.util.function.Supplier[org.apache.hadoop.conf.Configuration] {
        override def get() = new org.apache.hadoop.conf.Configuration(conf)
      })
    val entries =
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(
          statuses.map { status =>
            new java.util.concurrent.Callable[(Seq[String], FileEntry)] {
              override def call(): (Seq[String], FileEntry) = {
                val full = status.getPath.toUri.getPath
                require(full.startsWith(rootUri + "/"), s"$full outside $root")
                val rel = full.stripPrefix(rootUri + "/")
                val segs = full.split('/')
                val values = st.partitionCols.map { c =>
                  val pfx = s"__p_$c="
                  segs.collectFirst { case s if s.startsWith(pfx) =>
                    unescape(s.stripPrefix(pfx))
                  }.getOrElse(throw new IllegalStateException(
                    s"staged file $rel has no $pfx segment"))
                }
                val (rows, colStats) = {
                  val in = org.apache.parquet.hadoop.util.HadoopInputFile
                    .fromStatus(status, localConf.get())
                  val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                  try (rdr.getRecordCount, footerRangeStats(rdr))
                  finally rdr.close()
                }
                (values, FileEntry(rel, status.getLen, rows, colStats))
              }
            }
          }.asJava
        ).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    entries
      .groupBy(_._1.mkString("/"))
      .map { case (key, group) =>
        // deterministic manifest content: files sorted by path
        key -> PartitionEntry(group.head._1,
          group.map(_._2).sortBy(_.path))
      }
  }

  /** Aggregate each integral column's (min, max) across the open
    * file's row groups — the footer statistics parquet already wrote.
    * Columns with missing/empty stats in ANY row group are dropped
    * (they could not prove a bound for the whole file).
    */
  private def footerRangeStats(
      rdr: org.apache.parquet.hadoop.ParquetFileReader
  ): Map[String, (Long, Long)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val poisoned = scala.collection.mutable.Set.empty[String]
    rdr.getFooter.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.foreach { c =>
        if (c.getPath.size() == 1) {
          val name = c.getPath.toDotString
          val tn = c.getPrimitiveType.getPrimitiveTypeName
          if ((tn == INT32 || tn == INT64) && !poisoned.contains(name)) {
            val s = c.getStatistics
            if (s == null || s.isEmpty || !s.hasNonNullValue) {
              poisoned += name; acc.remove(name)
            } else {
              val (mn, mx) = s.genericGetMin match {
                case i: java.lang.Integer =>
                  (i.longValue(),
                    s.genericGetMax.asInstanceOf[java.lang.Integer].longValue())
                case l: java.lang.Long =>
                  (l.longValue(),
                    s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                case _ => (0L, -1L) // unreachable for INT32/INT64
              }
              acc.get(name) match {
                case Some((a, b)) =>
                  acc.update(name, (math.min(a, mn), math.max(b, mx)))
                case None => acc.update(name, (mn, mx))
              }
            }
          }
        }
      }
    }
    acc.toMap
  }

  /** Merge staged tables into the previous state per their [[Mode]]s —
    * the pure half of a commit, shared by [[commit]] and
    * [[commitRebase]].
    */
  private def mergeStaged(
      spark: SparkSession,
      root: String,
      staged: Seq[Staged],
      prevTables: Map[String, TableState]
  ): Map[String, TableState] = {
    var tables = prevTables
    staged.foreach { st =>
      val found = listStaged(spark, root, st)
      val next = (tables.get(st.table), st.mode) match {
        case (_, Replace) | (None, _) =>
          TableState(st.partitionCols, st.schemaDdl, found)
        case (Some(cur), Upsert) =>
          requireCompatible(st, cur)
          cur.copy(partitions = cur.partitions ++ found)
        case (Some(cur), Append) =>
          requireCompatible(st, cur)
          val merged = found.foldLeft(cur.partitions) { case (acc, (k, p)) =>
            acc.get(k) match {
              case Some(old) => acc.updated(k, old.copy(files = old.files ++ p.files))
              case None      => acc.updated(k, p)
            }
          }
          cur.copy(partitions = merged)
      }
      tables = tables.updated(st.table, next)
    }
    tables
  }

  /** Publish staged writes as ONE new manifest version: merge each
    * staged table into the previous manifest per its [[Mode]], write
    * the new manifest to a dotfile, and atomically swap it in. All
    * staged tables become visible together or — on any failure or
    * crash before the swap — not at all; the previous version's files
    * are untouched either way.
    *
    * `expectedVersion` makes the publish a compare-and-swap: the
    * commit applies only if the current manifest version still equals
    * it (0 for a fresh root; [[ANY_VERSION]] skips the check), else
    * throws [[ConcurrentCommitException]] with nothing published —
    * the optimistic-concurrency contract a multi-writer table needs.
    */
  def commit(
      spark: SparkSession,
      root: String,
      staged: Seq[Staged],
      expectedVersion: Long = ANY_VERSION
  ): Long = {
    require(staged.nonEmpty, "nothing staged")
    lockFor(root).synchronized {
      val prev =
        if (exists(spark, root)) Some(snapshot(spark, root)) else None
      if (expectedVersion != ANY_VERSION) {
        val got = prev.map(_.version).getOrElse(0L)
        if (got != expectedVersion)
          throw new ConcurrentCommitException(
            s"commit at $root expected version $expectedVersion " +
              s"but found $got — another writer committed first; " +
              "stage is unpublished")
      }
      val tables =
        mergeStaged(spark, root, staged, prev.map(_.tables).getOrElse(Map.empty))
      val version = prev.map(_.version + 1).getOrElse(1L)
      swapIn(root, version, tables, prev.map(_.batches).getOrElse(Map.empty))
      version
    }
  }

  /** Retry a commit that lost the CAS race, Delta-style: if every
    * partition the staged write touches is UNCHANGED between
    * `baseVersion` (what the writer read) and the current version,
    * the two writers were disjoint and the staged write re-applies on
    * top of the current state; if any touched partition changed in
    * between, the writer's inputs are stale and the commit refuses —
    * a silent merge would publish a lost update. `Replace` mode
    * always conflicts across versions (it claims the whole table).
    */
  def commitRebase(
      spark: SparkSession,
      root: String,
      staged: Seq[Staged],
      baseVersion: Long
  ): Long = {
    require(staged.nonEmpty, "nothing staged")
    lockFor(root).synchronized {
      val cur = snapshot(spark, root)
      if (cur.version != baseVersion) {
        val base = snapshotAt(spark, root, baseVersion)
        staged.foreach { st =>
          if (st.mode == Replace)
            throw new ConcurrentCommitException(
              s"table '${st.table}': Replace staged at v$baseVersion " +
                s"cannot rebase onto v${cur.version} — it claims every " +
                "partition")
          val touched = listStaged(spark, root, st).keySet
          val changed = changedPartitionKeys(base, cur, st.table)
          val overlap = touched.intersect(changed)
          if (overlap.nonEmpty)
            throw new ConcurrentCommitException(
              s"table '${st.table}': partitions ${overlap.toSeq.sorted
                .mkString(",")} changed between v$baseVersion and " +
                s"v${cur.version} and are also staged — rebase refused " +
                "(lost update)")
        }
      }
      val tables = mergeStaged(spark, root, staged, cur.tables)
      val version = cur.version + 1
      swapIn(root, version, tables, cur.batches)
      version
    }
  }

  /** Exactly-once publish for a streaming `foreachBatch` sink: the
    * manifest records, per sink id, the highest batchId applied; a
    * re-delivered batch (crash after commit, before the checkpoint
    * advanced) is recognized and NOT re-applied — the ledger and the
    * data share the single manifest swap, so there is no window where
    * one is updated and the other is not. Returns the current version
    * and whether this call published.
    */
  def commitBatch(
      spark: SparkSession,
      root: String,
      staged: Seq[Staged],
      sinkId: String,
      batchId: Long
  ): (Long, Boolean) = {
    require(staged.nonEmpty, "nothing staged")
    lockFor(root).synchronized {
      val prev =
        if (exists(spark, root)) Some(snapshot(spark, root)) else None
      val applied = prev.flatMap(_.batches.get(sinkId))
      if (applied.exists(_ >= batchId)) {
        (prev.get.version, false)
      } else {
        val tables =
          mergeStaged(spark, root, staged, prev.map(_.tables).getOrElse(Map.empty))
        val version = prev.map(_.version + 1).getOrElse(1L)
        val batches =
          prev.map(_.batches).getOrElse(Map.empty) + (sinkId -> batchId)
        swapIn(root, version, tables, batches)
        (version, true)
      }
    }
  }

  /** Partition keys of `table` whose file lists differ between two
    * snapshots (added, removed, or rewritten) — the file-granular
    * unit a change-data-feed read touches.
    */
  def changedPartitionKeys(a: Snapshot, b: Snapshot, table: String = MAIN): Set[String] = {
    val pa = a.tables.get(table).map(_.partitions).getOrElse(Map.empty)
    val pb = b.tables.get(table).map(_.partitions).getOrElse(Map.empty)
    (pa.keySet ++ pb.keySet).filter { k =>
      pa.get(k).map(_.files.map(_.path)) != pb.get(k).map(_.files.map(_.path))
    }
  }

  /** File-granular version diff: (files only in `to`, files only in
    * `from`) for `table` — the change-data-feed scan set. Everything
    * both versions share is untouched BY CONSTRUCTION (commits never
    * rewrite a referenced file in place), so a CDF read scans only
    * this delta, never the store.
    */
  def fileDiff(
      from: Snapshot,
      to: Snapshot,
      table: String = MAIN
  ): (Seq[FileEntry], Seq[FileEntry]) = {
    def files(s: Snapshot): Seq[FileEntry] =
      s.tables.get(table).map(_.partitions.values.flatMap(_.files).toSeq)
        .getOrElse(Seq.empty)
    val fa = files(from)
    val fb = files(to)
    val pa = fa.map(_.path).toSet
    val pb = fb.map(_.path).toSet
    (fb.filterNot(f => pa.contains(f.path)), fa.filterNot(f => pb.contains(f.path)))
  }

  /** Column names and types must match the manifest's (nullability
    * and column order are deliberately ignored — both drift across
    * lineages of the same logical frame, and parquet reconciles
    * columns by name, not position).
    */
  private def shapeOf(ddl: String): Seq[String] =
    StructType.fromDDL(ddl).fields.toSeq
      .map(f => f.name + ":" + f.dataType.sql)
      .sorted

  private def requireCompatible(st: Staged, cur: TableState): Unit = {
    require(st.partitionCols == cur.partitionCols,
      s"table '${st.table}': partition columns ${st.partitionCols} != " +
        s"manifest's ${cur.partitionCols}")
    require(shapeOf(st.schemaDdl) == shapeOf(cur.schemaDdl),
      s"table '${st.table}': staged schema <${st.schemaDdl}> != " +
        s"manifest's <${cur.schemaDdl}> — additive evolution goes " +
        "through Replace (the q110 path), not a silent merge")
  }

  /** Delete every `_data` file the last `retainVersions` manifests no
    * longer reference (superseded versions, aborted stagings), plus
    * the manifest history older than the retention window — the
    * reader-isolation and time-travel window ends here. The default
    * retains only the current version (the pre-history contract).
    * Returns the number of data files removed.
    */
  def vacuum(spark: SparkSession, root: String, retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the current version")
    val snap = snapshot(spark, root)
    val keepFrom = math.max(1L, snap.version - retainVersions + 1)
    val retained: Seq[Snapshot] = snap +:
      versions(spark, root)
        .filter(v => v >= keepFrom && v < snap.version)
        .map(v => snapshotAt(spark, root, v))
    versions(spark, root).filter(_ < keepFrom).foreach { v =>
      java.nio.file.Files.deleteIfExists(localPath(versionPath(root, v)))
    }
    val live: Set[String] = retained.flatMap(_.tables.values.flatMap(
      _.partitions.values.flatMap(_.files.map(_.path)))).toSet
    val dataDir = localPath(root + "/_data")
    if (!java.nio.file.Files.exists(dataDir)) return 0
    val rootP = localPath(root)
    var removed = 0
    import scala.jdk.CollectionConverters._
    val all = java.nio.file.Files.walk(dataDir).iterator().asScala.toSeq
    all.foreach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val rel = rootP.relativize(p).toString
        if (!live.contains(rel)) {
          java.nio.file.Files.delete(p)
          removed += 1
        }
      }
    }
    // sweep now-empty directories bottom-up
    all.sortBy(-_.getNameCount).foreach { p =>
      if (java.nio.file.Files.isDirectory(p) &&
        !java.nio.file.Files.list(p).iterator().hasNext)
        java.nio.file.Files.delete(p)
    }
    removed
  }

  // ---------------------------------------------------------------
  // Manifest serialization (Jackson tree API — on Spark's classpath)
  // ---------------------------------------------------------------

  private def swapIn(
      root: String,
      version: Long,
      tables: Map[String, TableState],
      batches: Map[String, Long]
  ): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.createObjectNode()
    doc.put("version", version)
    if (batches.nonEmpty) {
      val bn = doc.putObject("batches")
      batches.toSeq.sortBy(_._1).foreach { case (k, v) => bn.put(k, v) }
    }
    val tablesNode = doc.putObject("tables")
    tables.toSeq.sortBy(_._1).foreach { case (name, st) =>
      val t = tablesNode.putObject(name)
      val pc = t.putArray("partitionCols")
      st.partitionCols.foreach(pc.add)
      t.put("schemaDdl", st.schemaDdl)
      val parts = t.putObject("partitions")
      st.partitions.toSeq.sortBy(_._1).foreach { case (key, p) =>
        val pn = parts.putObject(key)
        val vs = pn.putArray("values")
        p.values.foreach(vs.add)
        val fsN = pn.putArray("files")
        p.files.foreach { f =>
          val fn = fsN.addObject()
          fn.put("path", f.path)
          fn.put("bytes", f.bytes)
          fn.put("rows", f.rows)
          if (f.stats.nonEmpty) {
            val sn = fn.putObject("stats")
            f.stats.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
              val a = sn.putArray(c); a.add(mn); a.add(mx)
            }
          }
        }
      }
    }
    val dir = localPath(manifestDir(root))
    java.nio.file.Files.createDirectories(dir)
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(doc)
    // History first: the versioned copy time travel and rebase diff
    // against. A crash here leaves an orphan vN the next commit (which
    // still sees v(N-1) as current) simply overwrites.
    java.nio.file.Files.write(localPath(versionPath(root, version)), bytes)
    val tmp = dir.resolve(s".staged-${java.util.UUID.randomUUID()}.json")
    java.nio.file.Files.write(tmp, bytes)
    // THE commit point: one rename(2). Before it, readers resolve the
    // previous manifest; after it, the new one — nothing in between.
    java.nio.file.Files.move(
      tmp,
      localPath(manifestPath(root)),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE
    )
  }

  private def parse(
      spark: SparkSession,
      root: String,
      bytes: Array[Byte]
  ): Snapshot = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.readTree(bytes)
    import scala.jdk.CollectionConverters._
    val tables = doc.get("tables").properties().asScala.map { e =>
      val t = e.getValue
      val pcols = t.get("partitionCols").elements().asScala
        .map(_.asText()).toSeq
      val parts = t.get("partitions").properties().asScala.map { pe =>
        val p = pe.getValue
        val values = p.get("values").elements().asScala.map(_.asText()).toSeq
        val files = p.get("files").elements().asScala.map { f =>
          val stats = Option(f.get("stats")) match {
            case Some(sn) =>
              sn.properties().asScala.map { se =>
                se.getKey ->
                  (se.getValue.get(0).asLong(), se.getValue.get(1).asLong())
              }.toMap
            case None => Map.empty[String, (Long, Long)]
          }
          FileEntry(
            f.get("path").asText(),
            f.get("bytes").asLong(),
            f.get("rows").asLong(),
            stats
          )
        }.toSeq
        pe.getKey -> PartitionEntry(values, files)
      }.toMap
      e.getKey -> TableState(pcols, t.get("schemaDdl").asText(), parts)
    }.toMap
    val batches = Option(doc.get("batches")) match {
      case Some(bn) =>
        bn.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      case None => Map.empty[String, Long]
    }
    new Snapshot(spark, root, doc.get("version").asLong(), tables, batches)
  }

  def snapshot(spark: SparkSession, root: String): Snapshot =
    parse(spark, root,
      java.nio.file.Files.readAllBytes(localPath(manifestPath(root))))

  /** Time travel: the store exactly as commit `version` published it,
    * every table at once — valid until [[vacuum]]'s retention window
    * passes the version by.
    */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot = {
    val p = localPath(versionPath(root, version))
    require(java.nio.file.Files.exists(p),
      s"no manifest for version $version at $root — never committed, " +
        "or vacuumed past the retention window")
    parse(spark, root, java.nio.file.Files.readAllBytes(p))
  }

  /** Versions still readable via [[snapshotAt]], ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = localPath(manifestDir(root))
    if (!java.nio.file.Files.exists(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong
      }
      .toSeq.sorted
  }

  // ---------------------------------------------------------------
  // Single-table conveniences (stage + commit in one call)
  // ---------------------------------------------------------------

  def write(
      df: DataFrame,
      root: String,
      partitionCols: Seq[String],
      table: String = MAIN
  ): Long =
    commit(df.sparkSession, root,
      Seq(stage(df, root, table, partitionCols, Replace)))

  def upsertPartitions(
      batch: DataFrame,
      root: String,
      partitionCols: Seq[String],
      table: String = MAIN
  ): Long =
    commit(batch.sparkSession, root,
      Seq(stage(batch, root, table, partitionCols, Upsert)))

  def append(
      batch: DataFrame,
      root: String,
      partitionCols: Seq[String],
      table: String = MAIN
  ): Long =
    commit(batch.sparkSession, root,
      Seq(stage(batch, root, table, partitionCols, Append)))

  def read(spark: SparkSession, root: String, table: String = MAIN): DataFrame =
    snapshot(spark, root).read(table)
}
