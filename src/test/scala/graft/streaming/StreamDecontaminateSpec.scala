package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming decontamination: arriving docs are scored against the
  * static eval shingle set with zero streaming state (append mode),
  * and the per-doc scores equal the batch dedup10 formulation.
  */
class StreamDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("ingest scoring matches the batch brute force; append mode, stateless") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val evalDocs = docs.filter(_._2 == "src0")
    val trainDocs = docs.filter(_._2 != "src0").take(40)
    val evalHashes = StreamDecontaminate.evalHashSet(
      graft.Tables(spark, sfDir).documents.filter($"source" === "src0")
    )
    assert(evalHashes.nonEmpty)
    assert(
      evalHashes.toSet ===
        evalDocs.flatMap(d => graft.plans.ShingleHashes.compute(d._3)).toSet
    )

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamDecontaminate
      .flagged(input.toDF().toDF("doc_id", "text"), evalHashes)
      .writeStream
      .outputMode("append") // stateless: append must be accepted
      .format("memory")
      .queryName("decon_stream")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft-decon").toString
      )
      .start()
    val (b1, b2) = trainDocs.splitAt(20)
    input.addData(b1.map(d => (d._1, d._3)).toSeq: _*)
    q.processAllAvailable()
    input.addData(b2.map(d => (d._1, d._3)).toSeq: _*)
    q.processAllAvailable()
    val got = spark
      .table("decon_stream")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .toSet
    q.stop()
    val evalSet = evalHashes.toSet
    val expected = trainDocs.map { case (id, _, text) =>
      val n = graft.plans.ShingleHashes.compute(text).toSet.intersect(evalSet).size
      (id, n, n >= 5)
    }.toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }
}
