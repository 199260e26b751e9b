package graft.sim

import graft.SparkSpec
import graft.sources.{ManifestStore, Scratch}
import org.apache.spark.sql.functions._

/** Pins the physical facts of retrain+rebalance that the sim27 oracle
  * cannot see: cells the moved set never touches keep their manifest
  * entries — the same immutable files — untouched, the moved fraction
  * is a small minority of the store, the sidecar lands in the SAME
  * commit as the store, and a rebalance onto the unchanged centroids
  * is a no-op (no new manifest version at all).
  */
class IvfRetrainSpec extends SparkSpec {

  private val K = 8
  private val STRIDE = 97
  private def emb =
    graft.Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding"))

  /** partition key → current file paths (immutable once written, so
    * path identity IS byte identity).
    */
  private def entryMap(path: String, table: String): Map[String, Seq[String]] =
    ManifestStore
      .snapshot(spark, path)
      .state(table)
      .partitions
      .map { case (k, p) => k -> p.files.map(_.path) }

  test("rebalance moves a small minority and leaves untouched cells' files alone") {
    Scratch.withTempDir("graft-retrain1") { path =>
      val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
      IvfStore.build(emb, cents, path, indexed = true)
      val beforeEntries = entryMap(path, ManifestStore.MAIN)
      val versionBefore = ManifestStore.snapshot(spark, path).version
      val newCents = IvfStore.retrain(spark, path, cents, iters = 2)
      val stats = IvfStore.rebalance(spark, path, newCents)
      // drift-corrected centroids move SOME vectors, not the store
      assert(stats.moved > 0, "fixture retrain produced no movement — vacuous")
      assert(stats.movedFraction < 0.5,
        s"moved ${stats.moved} of ${stats.total} — rebalance is not a minority move")
      // the stats' corpus size came from manifest metadata, not a scan
      assert(stats.total === emb.count())
      // cells outside the touched set keep their manifest entries —
      // the same immutable files (at this tiny fixture the full
      // retrain may touch every cell — the deterministic
      // untouched-identity pin lives in the split-cell test below;
      // here we pin the complement exactly)
      val touched = stats.touchedCells.map(c => s"cell=$c").toSet
      val afterEntries = entryMap(path, ManifestStore.MAIN)
      beforeEntries.foreach { case (c, files) =>
        if (!touched(c))
          assert(afterEntries.get(c).contains(files), s"untouched cell $c re-pointed")
      }
      // store and sidecar changed in ONE commit: exactly one new version
      assert(ManifestStore.snapshot(spark, path).version === versionBefore + 1,
        "rebalance must publish store+sidecar as a single commit")
      // the sidecar tracks the store in lockstep
      val store = ManifestStore
        .read(spark, path)
        .select(col("vec_id"), col("cell").cast("long").as("store_cell"))
      val idx = IvfStore
        .readIndexTable(spark, path)
        .select(col("vec_id"), col("cell").as("idx_cell"))
      val mismatched = store
        .join(idx, Seq("vec_id"), "full_outer")
        .filter(
          col("store_cell").isNull || col("idx_cell").isNull ||
            col("store_cell") =!= col("idx_cell"))
        .count()
      assert(mismatched === 0L, "sidecar diverged from the store after rebalance")
      // post-rebalance membership == a from-scratch assignment at newCents
      val fresh = IvfStore
        .assign(emb, newCents)
        .select(col("vec_id"), col("cell").as("fresh_cell"))
      val diff = store
        .join(fresh, Seq("vec_id"), "full_outer")
        .filter(
          col("store_cell").isNull || col("fresh_cell").isNull ||
            col("store_cell") =!= col("fresh_cell"))
        .count()
      assert(diff === 0L, "rebalanced store != from-scratch build at new centroids")
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(newCents)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(cents)
    }
  }

  test("a targeted cell split rebalances only donor cells; others keep their files") {
    // the fixture embeddings are near-uniform (every cell donates to
    // any new centroid), so the locality pin uses a CONSTRUCTED
    // geometry: 5 well-separated clusters on a line (x = 100g + j,
    // j < 10), centroids at the cluster anchors. A new cell planted
    // at x = 5 attracts exactly cluster 1's members with x > 2.5
    // (vec 3..9) and nothing else — deterministic donor set {1},
    // deterministic untouched set {2, 3, 4, 5}.
    import spark.implicits._
    Scratch.withTempDir("graft-retrain-split") { path =>
      val vecs = (0 until 50)
        .map { i =>
          val g = i / 10
          val off = i % 10
          (i.toLong, Seq((g * 100 + off).toDouble, 0.0, 0.0, 0.0))
        }
        .toDF("vec_id", "embedding")
      val cents = (0 until 5)
        .map(g => ((g + 1).toLong, Seq(g * 100L * 1000000L, 0L, 0L, 0L)))
        .toDF("cell", "qc")
      IvfStore.build(vecs, cents, path, indexed = true)
      val before = entryMap(path, ManifestStore.MAIN)
      val split = cents.unionByName(
        Seq((6L, Seq(5L * 1000000L, 0L, 0L, 0L))).toDF("cell", "qc")
      )
      val stats = IvfStore.rebalance(spark, path, split)
      assert(stats.moved === 7L, s"expected vec 3..9 to move, got ${stats.moved}")
      assert(stats.touchedCells.toSet === Set(1L, 6L))
      val after = entryMap(path, ManifestStore.MAIN)
      val untouched = before.filter { case (c, _) =>
        c != "cell=1" && c != "cell=6"
      }
      assert(untouched.nonEmpty)
      untouched.foreach { case (c, files) =>
        assert(after.get(c).contains(files), s"untouched cell $c re-pointed")
      }
      // the split store == from-scratch assignment at the split table
      val store = ManifestStore
        .read(spark, path)
        .select(col("vec_id"), col("cell").cast("long").as("store_cell"))
      val fresh = IvfStore
        .assign(vecs, split)
        .select(col("vec_id"), col("cell").as("fresh_cell"))
      val diff = store
        .join(fresh, Seq("vec_id"), "full_outer")
        .filter(
          col("store_cell").isNull || col("fresh_cell").isNull ||
            col("store_cell") =!= col("fresh_cell"))
        .count()
      assert(diff === 0L)
    }
  }

  test("rebalance onto the unchanged centroids is a no-op: no new version") {
    Scratch.withTempDir("graft-retrain2") { path =>
      val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
      IvfStore.build(emb, cents, path, indexed = true)
      val before = ManifestStore.snapshot(spark, path)
      val stats = IvfStore.rebalance(spark, path, cents)
      assert(stats.moved === 0L)
      assert(stats.touchedCells.isEmpty)
      val after = ManifestStore.snapshot(spark, path)
      assert(after.version === before.version,
        "no-drift rebalance still published a commit")
      assert(after.filePaths(ManifestStore.MAIN) ===
        before.filePaths(ManifestStore.MAIN))
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(cents)
    }
  }

  test("retrain keeps an addressable centroid for every cell (keep-old rule)") {
    Scratch.withTempDir("graft-retrain3") { path =>
      val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
      IvfStore.build(emb, cents, path)
      val k0 = cents.count()
      val newCents = IvfStore.retrain(spark, path, cents, iters = 3)
      assert(newCents.count() === k0, "retrain dropped a cell's centroid")
      assert(
        newCents.select(col("cell")).collect().map(_.getLong(0)).sorted.toSeq
          === cents.select(col("cell")).collect().map(_.getLong(0)).sorted.toSeq)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(newCents)
      org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(cents)
    }
  }
}
