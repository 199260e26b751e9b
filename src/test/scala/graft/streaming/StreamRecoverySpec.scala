package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The kill-and-restart contract a production stream lives by (the
  * reference's whole benchmark is restart behavior — scale-to-zero,
  * terraform/cloud_run.tf:17-20): a stateful query stopped mid-source
  * and restarted on the SAME checkpointLocation, with new data having
  * arrived in between, must (1) resume from the committed offsets —
  * the restarted run reads ONLY the new files, (2) recover its
  * operator state — aggregates continue from the first run's counts,
  * and dedup state suppresses duplicates that arrive AFTER the
  * restart of keys seen BEFORE it. And a `foreachBatch` sink must be
  * idempotent under batchId re-delivery — the crash window between
  * the sink's commit and the engine's offset write re-runs the last
  * batch with the same id.
  */
class StreamRecoverySpec extends SparkSpec {

  private def addFile(srcDir: String, name: String, df: DataFrame): Long = {
    val tmp = Files.createTempDirectory("graft-rec-tmp").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp)
      .listFiles()
      .find(_.getName.endsWith(".parquet"))
      .get
    Files.copy(part.toPath, Paths.get(srcDir, name))
    graft.sources.Scratch.deleteRecursively(tmp)
    df.count()
  }

  test("restart on the same checkpoint: offsets resume, agg and dedup state survive") {
    val e = Tables(spark, sfDir).events
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val srcDir = Files.createTempDirectory("graft-rec-src").toString
    val ckpt = Files.createTempDirectory("graft-rec-ck").toString

    // the stateful pipeline under test: watermarked key dedup feeding
    // a tumbling aggregate — BOTH operators keep state the restart
    // must recover
    def runPhase(): Long = {
      val stream = spark.readStream
        .schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val agg = WindowedEvents.tumblingByType(
        stream
          .withWatermark("ts", "10000 hours")
          .dropDuplicatesWithinWatermark("event_id")
      )
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("rec_sink")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "phase did not drain")
      q.recentProgress.map(_.numInputRows).sum
    }

    // phase 1: two slices arrive, the query drains them and STOPS —
    // state and offsets live only in the checkpoint now
    addFile(srcDir, "s0.parquet", e.filter(pmod(col("event_id"), lit(3)) === 0))
    addFile(srcDir, "s1.parquet", e.filter(pmod(col("event_id"), lit(3)) === 1))
    runPhase()

    // between the runs: the last slice arrives TOGETHER WITH a full
    // replay of slice 0 — duplicates of keys whose dedup state exists
    // only in the checkpoint
    val lateRows = addFile(
      srcDir,
      "s2_with_dups.parquet",
      e.filter(pmod(col("event_id"), lit(3)) === 2)
        .unionByName(e.filter(pmod(col("event_id"), lit(3)) === 0))
    )

    // phase 2: a NEW query on the same checkpoint
    val rowsB = runPhase()
    assert(rowsB === lateRows,
      s"restart re-read old files: processed $rowsB rows, new file has $lateRows")

    val got = spark
      .table("rec_sink")
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val batchAnswer = WindowedEvents
      .tumblingByType(e)
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === batchAnswer,
      "restarted stream diverged from the batch answer")
    // the test has power: had the dedup state NOT survived the
    // restart, the replayed slice would double-count into this
    val withDups = WindowedEvents
      .tumblingByType(
        e.unionByName(e.filter(pmod(col("event_id"), lit(3)) === 0)))
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(withDups !== batchAnswer,
      "fixture too small: the replayed slice changes nothing")

    graft.sources.Scratch.deleteRecursively(srcDir)
    graft.sources.Scratch.deleteRecursively(ckpt)
  }

  test("foreachBatch sink: re-delivery of the last batchId is a no-op") {
    // the crash window foreachBatch sinks must survive: the sink's
    // effects committed, the engine's offset write lost → on restart
    // the SAME batch arrives again with the SAME batchId. The
    // membership-log anti-join makes the re-run emit nothing and
    // write nothing. (cdc13's replay spec pins slicing-invariance;
    // this pins redelivery-after-restart.)
    val docs = Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
    val state = StreamMinhashDedup.newState(spark)
    try {
      val b0 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val b1 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val p0 = StreamMinhashDedup.ingest(state, b0, 0L)
      val p1 = StreamMinhashDedup.ingest(state, b1, 1L)
      val pairsBefore = p0.count() + p1.count()
      val logBefore = state.log.count()
      assert(logBefore > 0)

      val redelivered = StreamMinhashDedup.ingest(state, b1, 1L)
      assert(redelivered.count() === 0L,
        "re-delivered batch re-emitted candidate pairs")
      assert(state.log.count() === logBefore,
        "re-delivered batch grew the membership log")
      // and the accumulated result is exactly what one delivery built
      assert(pairsBefore ===
        StreamMinhashDedup.replay(docs, splits = 2).count())
    } finally state.close()
  }
}
