package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.Tables
import graft.sim.{IntVec, IvfStore}
import graft.sources.ManifestStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live readStream→foreachBatch face of IVF maintenance: the
  * cdc15/cdc16 churn waves fed through a MemoryStream must leave the
  * INDEXED store — inverted lists and id→cell sidecar both — equal to
  * a from-scratch build of the final logical state. A batch mixing a
  * delete and a newer upsert of the same key exercises the in-batch
  * seq resolution.
  */
class StreamIvfMaintainSpec extends SparkSpec {

  private val K = 8
  private val STRIDE = 97

  private def rotate(v: Seq[Float], n: Int): Seq[Float] =
    v.drop(n) ++ v.take(n)

  private def snapshot(dir: String): Map[Long, (Long, Seq[Long])] =
    ManifestStore
      .read(spark, dir)
      .select(
        col("vec_id"),
        col("cell").cast("long"),
        IntVec.quant(col("embedding")).as("qe")
      )
      .collect()
      .map(r =>
        r.getLong(0) ->
          ((r.getLong(1), r.getAs[scala.collection.Seq[Long]]("qe").toSeq))
      )
      .toMap

  test("MemoryStream churn lands store AND sidecar on the full rebuild") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val emb = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    val cents = IvfStore.centroids(emb, K, STRIDE).localCheckpoint(true)
    val live = Files.createTempDirectory("graft-ivf-live").toString
    val ckpt = Files.createTempDirectory("graft-ivf-ckpt").toString
    IvfStore.build(emb, cents, live, indexed = true)

    val rows: Map[Long, Seq[Float]] = emb
      .collect()
      .map(r =>
        r.getLong(0) ->
          r.getAs[scala.collection.Seq[Float]]("embedding").toSeq
      )
      .toMap

    val input = MemoryStream[(String, Long, Seq[Float], Long)]
    val envelopes = input.toDF().toDF("op", "vec_id", "embedding", "seq")
    val q = StreamIvfMaintain.maintainQuery(envelopes, live, cents, ckpt)
    try {
      // wave 1: re-embedding drift (the cdc15 rot-1 wave)
      input.addData(rows.collect {
        case (id, v) if id % 7 == 1 => ("u", id, rotate(v, 1), 1L)
      }.toSeq: _*)
      q.processAllAvailable()
      // wave 2 delivers the delete wave AND, for the overlap ids, the
      // newer rot-2 upsert IN THE SAME BATCH — the max-seq reduction
      // must resolve each key before disk is touched
      input.addData(
        (rows.collect {
          case (id, _) if id % 5 == 2 =>
            ("d", id, Seq.empty[Float], 2L)
        } ++ rows.collect { case (id, v) if id % 14 == 1 =>
          ("u", id, rotate(v, 2), 3L)
        }).toSeq: _*
      )
      q.processAllAvailable()
    } finally q.stop()

    // from-scratch build of the same final logical state
    val rot = (c: org.apache.spark.sql.Column, n: Int) =>
      concat(slice(c, lit(n + 1), size(c) - n), slice(c, lit(1), lit(n)))
    val finalState = emb
      .filter(
        pmod(col("vec_id"), lit(5)) =!= 2 || pmod(col("vec_id"), lit(14)) === 1
      )
      .select(
        col("vec_id"),
        when(pmod(col("vec_id"), lit(14)) === 1, rot(col("embedding"), 2))
          .when(pmod(col("vec_id"), lit(7)) === 1, rot(col("embedding"), 1))
          .otherwise(col("embedding"))
          .as("embedding")
      )
    val full = Files.createTempDirectory("graft-ivf-full2").toString
    IvfStore.build(finalState, cents, full)

    val a = snapshot(live)
    val b = snapshot(full)
    assert(a.keySet === b.keySet)
    a.foreach { case (v, st) => assert(st === b(v), s"vec $v diverged") }
    // the sidecar tracked the streamed churn exactly
    val idx = IvfStore
      .readIndexTable(spark, live)
      .select(col("vec_id"), col("cell"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(idx === a.map { case (v, (c, _)) => v -> c })
  }
}
