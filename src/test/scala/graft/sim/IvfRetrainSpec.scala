package graft.sim

import graft.SparkSpec
import graft.sources.{PartitionedStore, Scratch}
import org.apache.spark.sql.functions._

/** Pins the physical facts of retrain+rebalance that the sim27 oracle
  * cannot see: cells the moved set never touches keep their files
  * byte-for-byte, the moved fraction is a small minority of the
  * store, the sidecar tracks the store in lockstep, and a rebalance
  * onto the unchanged centroids is a no-op on disk.
  */
class IvfRetrainSpec extends SparkSpec {

  private val K = 8
  private val STRIDE = 97
  private def emb =
    graft.Tables(spark, sfDir).embeddings.select(col("vec_id"), col("embedding"))

  private def md5s(path: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files
      .walk(root)
      .iterator()
      .asScala
      .filter(p =>
        java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
      .map { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        root.relativize(p).toString -> java.security.MessageDigest
          .getInstance("MD5")
          .digest(bytes)
          .map(b => f"$b%02x")
          .mkString
      }
      .toMap
  }

  test("rebalance moves a small minority and leaves untouched cells byte-identical") {
    Scratch.withTempDir("graft-retrain1") { path =>
      val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
      IvfStore.build(emb, cents, path, indexed = true)
      val beforeFiles = md5s(path)
      val newCents = IvfStore.retrain(spark, path, cents, iters = 2)
      val stats = IvfStore.rebalance(spark, path, newCents)
      // drift-corrected centroids move SOME vectors, not the store
      assert(stats.moved > 0, "fixture retrain produced no movement — vacuous")
      assert(stats.movedFraction < 0.5,
        s"moved ${stats.moved} of ${stats.total} — rebalance is not a minority move")
      // cells outside the touched set keep their files byte-for-byte
      // (at this tiny fixture the full retrain may touch every cell —
      // the deterministic untouched-identity pin lives in the
      // split-cell test below; here we pin the complement exactly)
      val touched = stats.touchedCells.map(c => s"cell=$c").toSet
      val afterFiles = md5s(path)
      beforeFiles.foreach { case (p, fp) =>
        if (!p.startsWith("_index") && !touched.exists(p.startsWith))
          assert(afterFiles.get(p).contains(fp), s"untouched file changed: $p")
      }
      // the sidecar tracks the store in lockstep
      val store = PartitionedStore
        .read(spark, path)
        .select(col("vec_id"), col("cell").cast("long").as("store_cell"))
      val idx = PartitionedStore
        .read(spark, IvfStore.indexPath(path))
        .select(col("vec_id"), col("cell").cast("long").as("idx_cell"))
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

  test("a targeted cell split rebalances only donor cells; others byte-identical") {
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
      val before = md5s(path)
      val split = cents.unionByName(
        Seq((6L, Seq(5L * 1000000L, 0L, 0L, 0L))).toDF("cell", "qc")
      )
      val stats = IvfStore.rebalance(spark, path, split)
      assert(stats.moved === 7L, s"expected vec 3..9 to move, got ${stats.moved}")
      assert(stats.touchedCells.toSet === Set(1L, 6L))
      val touched = stats.touchedCells.map(c => s"cell=$c").toSet
      val after = md5s(path)
      val untouched = before.filter { case (p, _) =>
        !p.startsWith("_index") && !touched.exists(p.startsWith)
      }
      assert(untouched.nonEmpty)
      untouched.foreach { case (p, fp) =>
        assert(after.get(p).contains(fp), s"untouched file changed: $p")
      }
      // the split store == from-scratch assignment at the split table
      val store = PartitionedStore
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

  test("rebalance onto the unchanged centroids is a no-op on disk") {
    Scratch.withTempDir("graft-retrain2") { path =>
      val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
      IvfStore.build(emb, cents, path, indexed = true)
      val before = md5s(path)
      val stats = IvfStore.rebalance(spark, path, cents)
      assert(stats.moved === 0L)
      assert(stats.touchedCells.isEmpty)
      assert(md5s(path) === before, "no-drift rebalance still rewrote files")
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
