package graft.sim

import java.nio.file.Files

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** IVF-as-storage-layout: cell pruning at the directory listing,
  * exhaustive-probe exactness, and probed-subset semantics.
  */
class IvfStoreSpec extends SparkSpec {

  private val K = 8
  private val STRIDE = 97

  private lazy val store: (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft-ivf").toString
    val emb = Tables(spark, sfDir).embeddings
    val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
    IvfStore.build(emb, cents, dir)
    (dir, cents)
  }

  private def queryVec: Seq[Float] = Tables(spark, sfDir).embeddings
    .orderBy("vec_id")
    .limit(1)
    .collect()(0)
    .getAs[scala.collection.Seq[Float]]("embedding")
    .toSeq

  test("exhaustive probe (nProbe = K) equals brute force over the store") {
    val (dir, cents) = store
    val got = IvfStore
      .topK(spark, dir, cents, queryVec, 5, nProbe = K)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dist2")))
    // brute force with the same exact-integer metric over ALL rows
    val q = queryVec.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val brute = Tables(spark, sfDir).embeddings
      .collect()
      .map { r =>
        val v = r
          .getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
        val d =
          q.iterator.zip(v.iterator).map { case (a, b) => val t = a - b; t * t }.sum
        (r.getAs[Long]("vec_id"), d)
      }
      .sortBy { case (id, d) => (d, id) }
      .take(5)
      .map { case (id, d) => (id, d) }
    assert(got.toSeq === brute.toSeq)
  }

  test("nProbe = 2 prunes at the manifest and is exact within probed cells") {
    val (dir, cents) = store
    val res = IvfStore.topK(spark, dir, cents, queryVec, 5, nProbe = 2)
    val cells = IvfStore.probeCells(cents, queryVec, 2)
    assert(cells.length === 2)
    // pruning evidence: the scan's input files are EXACTLY the probed
    // cells' manifest files — no other cell's files were even listed
    // (manifest pruning runs before Spark's file index exists). Paths
    // compared root-relative: one coalesced write task gives every
    // partition dir the SAME part-file basename.
    val snap = graft.sources.ManifestStore.snapshot(spark, dir)
    val want = snap.state(graft.sources.ManifestStore.MAIN)
      .partitions.values
      .filter(p => cells.map(_.toString).contains(p.values.head))
      .flatMap(_.files.map(_.path)).toSet
    val all = snap.filePaths().toSet
    assert(res.inputFiles.map(f => f.substring(f.indexOf("_data/"))).toSet
      === want)
    assert(want.size < all.size, "fixture too small for pruning to show")
    // results come only from probed cells and match a manual scan of
    // those cells with the same metric
    val got = res.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Long]("dist2"))
    )
    assert(got.forall(r => cells.contains(r._2)))
    val manual = graft.sources.ManifestStore
      .read(spark, dir)
      .filter(col("cell").isin(cells: _*))
      .collect()
      .map { r =>
        val q = queryVec.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
        val v = r
          .getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
        val d =
          q.iterator.zip(v.iterator).map { case (a, b) => val t = a - b; t * t }.sum
        (r.getAs[Long]("vec_id"), d)
      }
      .sortBy { case (id, d) => (d, id) }
      .take(5)
    assert(got.map(r => (r._1, r._3)).toSeq === manual.toSeq)
  }

  test("build fails loudly on a ragged vector (no silent drop)") {
    val (_, cents) = store
    val dir2 = Files.createTempDirectory("graft-ivf-ragged").toString
    import spark.implicits._
    val ragged = Tables(spark, sfDir).embeddings
      .orderBy("vec_id")
      .limit(3)
      .select(col("vec_id"), col("embedding"))
      .unionByName(
        Seq((999999L, Seq(1.0f, 2.0f, 3.0f)))
          .toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>"))
      )
    val e = intercept[Exception] {
      IvfStore.build(ragged, cents, dir2)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause)
      )
    assert(
      messages(e).exists(_.contains("dimensionality mismatch")),
      messages(e).mkString(" | ")
    )
  }

  test("fetch by id: sidecar prunes both reads; content is exact") {
    val dir = Files.createTempDirectory("graft-ivf-fetch").toString
    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
    IvfStore.build(emb, cents, dir, indexed = true)

    val ids = emb
      .filter(pmod(col("vec_id"), lit(97)) === 3)
      .select("vec_id")
      .localCheckpoint(true)
    val nIds = ids.count()
    assert(nIds > 0)
    val res = IvfStore.fetch(spark, dir, ids)
    // the STORE read is cell-pruned at the manifest (the fetch's whole
    // point: B ids touch their holding cells, not the store): its
    // input files are a strict subset of the store's current files
    val snap = graft.sources.ManifestStore.snapshot(spark, dir)
    val all = snap.filePaths().toSet
    val readFiles = res.inputFiles
      .map(f => f.substring(f.indexOf("_data/"))).toSet
    assert(readFiles.subsetOf(all), "fetch read files outside the manifest")
    assert(readFiles.size < all.size,
      s"fetch read ${readFiles.size} of ${all.size} files — no pruning")
    // content: exactly the requested rows, each with its assigned cell
    val got = res
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell")))
      .toMap
    assert(got.keySet === ids.collect().map(_.getLong(0)).toSet)
    val expect = IvfStore
      .assign(emb, cents)
      .join(ids, Seq("vec_id"), "left_semi")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell"))
      .toMap
    assert(got === expect)
    // absent ids are absent, not an error
    import spark.implicits._
    val none = IvfStore
      .fetch(spark, dir, Seq(-12345L).toDF("vec_id"))
      .count()
    assert(none === 0)
  }

  test("store upsert: re-committing one cell re-points only that cell") {
    val (dir, cents) = store
    import graft.sources.ManifestStore
    val before = ManifestStore.read(spark, dir)
    val someCell = IvfStore.probeCells(cents, queryVec, 1).head
    val batch = before.filter(col("cell") === someCell)
    val otherCount = before.filter(col("cell") =!= someCell).count()
    val otherEntries = ManifestStore.snapshot(spark, dir)
      .state(ManifestStore.MAIN).partitions
      .filter(_._2.values.head != someCell.toString)
    ManifestStore.upsertPartitions(batch, dir, Seq("cell"))
    val after = ManifestStore.read(spark, dir)
    assert(after.filter(col("cell") =!= someCell).count() === otherCount)
    assert(ManifestStore.snapshot(spark, dir)
      .state(ManifestStore.MAIN).partitions
      .filter(_._2.values.head != someCell.toString) === otherEntries,
      "untouched cells were re-pointed")
  }
}
