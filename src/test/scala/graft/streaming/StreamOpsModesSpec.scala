package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Operational streaming modes a production deployment leans on:
  *
  *  - `Trigger.AvailableNow`: drain everything currently in the
  *    source across rate-limited micro-batches, then STOP — the
  *    batch-incremental schedule (cron-restart a job that catches up
  *    and exits, keeping checkpointed exactly-once semantics without
  *    a resident cluster). The drained result must equal the batch
  *    read.
  *
  *  - RocksDB state store provider: stateful aggregation state kept
  *    off-heap/on-disk instead of in executor heap — the provider
  *    that survives 100 TB-scale keyed state (heap HDFSBackedState
  *    evicts/OOMs first). Same query, same results, only the
  *    provider conf changes — which is the point: state backend is
  *    deployment config, not query logic.
  */
class StreamOpsModesSpec extends SparkSpec {

  private def streamedTumbling(extraConf: Map[String, String]): Array[(java.sql.Timestamp, String, Long, Double)] = {
    val dir = Files.createTempDirectory("graft-opsrc")
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING
    )
    val ckpt = Files.createTempDirectory("graft-opck").toString
    val before = extraConf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
      val rawSchema = spark.read.parquet(dir.toString).schema
      val raw = spark.readStream
        .schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      val stream = rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
      val q = WindowedEvents
        .tumblingByType(stream, watermark = Some("1 hour"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("ops_modes_sink")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // AvailableNow terminates on its own once the source is drained
      assert(q.awaitTermination(120000), "AvailableNow did not terminate")
      spark
        .table("ops_modes_sink")
        .orderBy("window_start", "event_type")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    } finally {
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  private lazy val batch = WindowedEvents
    .tumblingByType(Tables(spark, sfDir).events)
    .orderBy("window_start", "event_type")
    .collect()
    .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("Trigger.AvailableNow drains the source, stops, and equals batch") {
    assert(streamedTumbling(Map.empty).toSeq === batch.toSeq)
  }

  test("RocksDB state store produces identical aggregates") {
    val out = streamedTumbling(Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ))
    assert(out.toSeq === batch.toSeq)
  }
}
