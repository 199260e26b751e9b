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

  /** Assign every vector to its nearest centroid and write the store
    * partitioned by cell (one directory per inverted list).
    */
  def build(embeddings: DataFrame, cents: DataFrame, path: String): Unit = {
    val assigned = embeddings
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
              lit("IvfStore.build: embedding dimensionality mismatch at vec_id="),
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
    PartitionedStore.write(assigned, path, Seq("cell"))
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
