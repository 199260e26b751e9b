package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** End-to-end file-source streaming: the production-shaped path
  * (parquet directory watched by Structured Streaming) must produce
  * the same windowed aggregates as the batch read of the same data.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream produces batch-identical tumbling windows") {
    val dir = Files.createTempDirectory("graft-evsrc")
    Files.copy(
      Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING
    )
    val ckpt = Files.createTempDirectory("graft-evck").toString

    // same ts normalization as Tables.events, on the stream schema
    // (ns-long fixture generations need the div-1000 truncation;
    // µs-timestamp generations read as TimestampType directly)
    val rawSchema = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream
      .schema(rawSchema)
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
      .queryName("file_stream_test")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    val streamed = spark
      .table("file_stream_test")
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    q.stop()

    val batch = WindowedEvents
      .tumblingByType(Tables(spark, sfDir).events)
      .orderBy("window_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }
}
