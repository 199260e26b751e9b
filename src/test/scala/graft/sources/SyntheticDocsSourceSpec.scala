package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The V2 generator source: registered short name, reshardable
  * determinism, and column-pruning pushdown reaching the reader.
  */
class SyntheticDocsSourceSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int, seed: Int = 7) =
    spark.read
      .format("graft-docs")
      .option("rows", rows)
      .option("partitions", parts)
      .option("seed", seed)
      .load()

  test("same (rows, seed) yields the same corpus at any partition count") {
    val a = gen(500, 4).collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    val b = gen(500, 13).collect().map(_.toSeq).sortBy(_.head.toString.toLong)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
    // and a different seed yields a different corpus
    val c = gen(500, 4, seed = 8).collect().map(_.toSeq)
      .sortBy(_.head.toString.toLong)
    assert(a.toSeq !== c.toSeq)
  }

  test("schema matches the documents fixture contract") {
    val df = gen(10, 2)
    assert(df.schema === SyntheticDocsSource.SCHEMA)
    val r = df.orderBy("doc_id").head()
    assert(r.getLong(4) === r.getString(1).length.toLong)
    assert(SyntheticDocsSource.LANGS.contains(r.getString(2)))
  }

  test("column pruning reaches the reader (BatchScan output shrinks)") {
    val pruned = gen(100, 2).select("doc_id", "lang")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan planned")
    assert(
      scans.head.output.map(_.name) === Seq("doc_id", "lang"),
      s"pruned schema not pushed: ${scans.head.output}"
    )
    assert(pruned.count() === 100L)
  }

  test("doc_id range filters prune generation slices at planning time") {
    val df = gen(1000, 10).filter(col("doc_id") >= 250 && col("doc_id") < 450)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    // 10 slices of 100 ids; [250, 450) touches slices 2,3,4 only
    assert(
      scans.head.inputRDD.getNumPartitions === 3,
      "pushed range must prune untouched slices"
    )
    val ids = df.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.head === 250L && ids.last === 449L && ids.length === 200)
    // point lookup plans a single slice
    val point = gen(1000, 10).filter(col("doc_id") === 777)
    val pScan = point.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(pScan.inputRDD.getNumPartitions === 1)
    assert(point.count() === 1L)
  }

  test("generated corpus drives the real operators") {
    // the generator exists to feed the engine at arbitrary scale:
    // the text-quality query runs unchanged over it
    val df = gen(200, 4)
    val scored = df.select(
      col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")
    )
    assert(scored.agg(min(col("n_tokens").cast("long"))).head().getLong(0) >= 20L)
    assert(scored.agg(max(col("n_tokens").cast("long"))).head().getLong(0) <= 40L)
  }
}
