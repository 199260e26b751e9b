package graft.sim

import graft.sources.PartitionedStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index as a STORAGE LAYOUT: vectors written to parquet
  * partitioned by their nearest-centroid cell, served by reading ONLY
  * the probed cells' directories — `sim06` turns its cell routing
  * into directory pruning, the serving shape every vector store uses
  * (FAISS IVF lists, Milvus segments: the list IS the file).
  *
  * Build: one broadcast-assign pass (K·D integer multiply-adds per
  * vector — the sim18/sim23 exact micro-unit discipline) and one
  * partitioned write; per-cell file counts follow the cell
  * populations. Serve: the query's nProbe nearest cells come from a
  * K-row driver computation (the sanctioned tiny collect — the
  * centroid table is the index's only driver-resident state), and the
  * `cell IN (...)` filter prunes at the DIRECTORY listing —
  * `PartitionFilters` in the scan, spec-pinned — so a 1000-cell store
  * reads nProbe/1000 of its bytes per query. Scoring inside probed
  * cells is exact integer L2 (bit-reproducible); results are exactly
  * brute force restricted to the probed cells, and nProbe = K is
  * exhaustive by construction.
  *
  * At 100 TB: cells are also the UPSERT unit — a re-embedded batch
  * rewrites only its touched cells via
  * [[PartitionedStore.overwritePartitions]], never the store.
  */
object IvfStore {

  private def quant(c: Column): Column = IntVec.quant(c)
  private def dist2(a: Column, b: Column): Column = IntVec.dist2(a, b)

  /** Deterministic stride-sampled centroid table (cell 1..k), the
    * sim06/sim23 seeding: (cell, qc: array<long>).
    */
  def centroids(embeddings: DataFrame, k: Int, stride: Int): DataFrame =
    IntVec.strideSeeds(
      embeddings.select(col("vec_id"), IntVec.quant(col("embedding")).as("qe")),
      stride,
      k,
      "cell",
      "qc"
    )

  /** Nearest-centroid assignment: (vec_id, embedding) → (vec_id,
    * embedding, cell), exact integer L2, ties on the lower cell id.
    * Shared by the initial build and the incremental upsert path so
    * the routing rule cannot drift between them.
    */
  def assign(embeddings: DataFrame, cents: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"), quant(col("embedding")).as("qe"))
      .crossJoin(broadcast(cents))
      // dims guard (the sim11 fail-loudly contract): a ragged vector
      // must ABORT the build, not silently vanish from the index — a
      // store built with a dropped row would serve from an incomplete
      // corpus with no error anywhere. raise_error is non-foldable,
      // so the optimizer keeps the check.
      .filter(
        when(size(col("qe")) === size(col("qc")), lit(true)).otherwise(
          raise_error(
            concat(
              lit("IvfStore.assign: embedding dimensionality mismatch at vec_id="),
              col("vec_id").cast("string")
            )
          ).cast("boolean")
        )
      )
      .select(
        col("vec_id"),
        col("embedding"),
        col("cell"),
        dist2(col("qe"), col("qc")).as("__d")
      )
      .groupBy(col("vec_id"), col("embedding"))
      .agg(min(struct(col("__d"), col("cell"))).as("__a"))
      .select(col("vec_id"), col("embedding"), col("__a.cell").as("cell"))

  /** Assign every vector to its nearest centroid and write the store
    * partitioned by cell (one directory per inverted list).
    */
  def build(embeddings: DataFrame, cents: DataFrame, path: String): Unit =
    PartitionedStore.write(assign(embeddings, cents), path, Seq("cell"))

  /** Cells currently holding any of `ids` — a ≤K-row driver read (the
    * sanctioned tiny collect; the store has at most K cells). The
    * lookup scans the store's `vec_id` column across all cells
    * (column-pruned — vectors are never read), so the LOOKUP is
    * O(store ids) while the WRITES stay O(touched cells); a
    * deployment where even the id-column scan is too much keeps an
    * id→cell sidecar index (itself partition-updatable) and skips
    * this probe.
    */
  private def cellsOf(current: DataFrame, ids: DataFrame): Seq[Long] =
    current
      .join(ids.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("cell").cast("long"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSeq

  /** Rewrite exactly the `touched` cells with `rewritten` via dynamic
    * partition overwrite, failing loudly if a touched cell would end
    * EMPTY: an absent partition in the incoming frame is left
    * untouched on disk (parquet has no partition-drop), so an emptied
    * cell would silently resurrect its old files — stale rows after a
    * move-away, deleted rows after a delete. At that point the store
    * needs a partition-drop-capable table format (Delta/Iceberg
    * replaceWhere) or a rebuild; the fixture never empties a cell.
    * The `rewritten` frame is materialized first so the emptiness
    * check and the write read one computation.
    */
  private def overwriteTouched(
      rewritten: DataFrame,
      touched: Seq[Long],
      path: String
  ): Unit = {
    val frame = rewritten.localCheckpoint(true)
    val kept = frame
      .select(col("cell").cast("long"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet
    val emptied = touched.filterNot(kept)
    require(
      emptied.isEmpty,
      s"IvfStore: rewrite would empty cell(s) ${emptied.sorted.mkString(",")}: " +
        "dynamic partition overwrite cannot drop a partition"
    )
    PartitionedStore.overwritePartitions(frame, path, Seq("cell"))
    org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(frame)
  }

  /** Incremental upsert: re-embedded (or newly inserted) vectors move
    * to their new nearest cell; ONLY the touched partitions — each
    * vector's old cell (if it was in the store) and its new cell —
    * are rewritten — WRITE cost is O(touched cells), never O(store),
    * and the untouched inverted lists keep their files byte-for-byte
    * (the old-cell LOOKUP reads the store's id column; see
    * [[cellsOf]]).
    */
  def upsert(
      spark: SparkSession,
      path: String,
      cents: DataFrame,
      batch: DataFrame
  ): Unit = {
    val assigned = assign(batch, cents).localCheckpoint(true)
    // partition-column inference reads `cell=N` directories back as
    // INT; normalize to the written LONG so unions and driver reads
    // see one type
    val current = PartitionedStore
      .read(spark, path)
      .withColumn("cell", col("cell").cast("long"))
    val touched = (cellsOf(current, batch) ++
      assigned.select("cell").distinct().collect().map(_.getLong(0))).distinct
    val rewritten = current
      .filter(col("cell").isin(touched: _*))
      .join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(assigned)
    overwriteTouched(rewritten, touched, path)
    org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(assigned)
  }

  /** Incremental delete: rewrite only the cells holding the deleted
    * ids, without them (see [[overwriteTouched]] for the emptied-cell
    * contract).
    */
  def delete(
      spark: SparkSession,
      path: String,
      ids: DataFrame
  ): Unit = {
    val current = PartitionedStore
      .read(spark, path)
      .withColumn("cell", col("cell").cast("long"))
    val touched = cellsOf(current, ids)
    if (touched.nonEmpty) {
      val rewritten = current
        .filter(col("cell").isin(touched: _*))
        .join(ids.select("vec_id"), Seq("vec_id"), "left_anti")
      overwriteTouched(rewritten, touched, path)
    }
  }

  /** The query's nProbe nearest cells, computed driver-side over the
    * K-row centroid table (deterministic tie-break on cell id).
    */
  def probeCells(cents: DataFrame, query: Seq[Float], nProbe: Int): Seq[Long] = {
    val q = query.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    cents
      .collect()
      .map { r =>
        val cell = r.getAs[Long]("cell")
        val qc = r.getAs[scala.collection.Seq[Long]]("qc")
        val d =
          if (qc.length != q.length) Long.MaxValue
          else q.iterator.zip(qc.iterator).map { case (a, b) =>
            val t = a - b; t * t
          }.sum
        (d, cell)
      }
      .sortBy(identity)
      .take(nProbe)
      .map(_._2)
      .toSeq
  }

  /** Exact top-k within the probed cells: the `cell IN (...)` filter
    * prunes at the directory listing (PartitionFilters), scoring is
    * exact integer L2, ties break on vec_id.
    */
  def topK(
      spark: SparkSession,
      path: String,
      cents: DataFrame,
      query: Seq[Float],
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val cells = probeCells(cents, query, nProbe)
    val q = query.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val qLit = array(q.map(lit(_)): _*)
    PartitionedStore
      .read(spark, path)
      .filter(col("cell").isin(cells: _*))
      // dims contract (the sim07/sim11 discipline): a ragged row would
      // score NULL and NULLS-FIRST would rank it ABOVE every real hit
      .filter(size(col("embedding")) === lit(query.length))
      .select(
        col("vec_id"),
        col("cell"),
        dist2(quant(col("embedding")), qLit).as("dist2")
      )
      .orderBy(col("dist2"), col("vec_id"))
      .limit(k)
  }
}
