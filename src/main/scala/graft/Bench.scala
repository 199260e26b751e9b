package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query
  * wall-clock seconds on SPARK_GRAFT_SF_DIR.
  *
  * Methodology follows the reference's scripts (SURVEY.md §6): a
  * warm-up pass absorbs session/codegen/file-listing cold cost
  * (reference test_warm_performance.sh skips request 1), then each
  * query is timed executing its FULL plan into a no-op sink — count()
  * would let the optimizer drop sorts/projections and under-report.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString
    )
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry
          .queries(name)(spark, sfDir)
          .write
          .format("noop")
          .mode("overwrite")
          .save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: session, parquet footers
    val names = SparkEntry.queries.keys.toSeq.sorted
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents, t.embeddings)
      .foreach(_.count())

    // Reference methodology (BASELINE.md): warm = mean excluding
    // request 1 (test_warm_performance.sh). Run 1 pays Janino/JIT
    // compilation of the generated code; the headline value is the
    // warm total. The printed line stays COMPACT (3-decimal values,
    // warm map only) — the driver captures a bounded output tail, and
    // a long line falls outside it and parses as null. Full-precision
    // cold+warm detail goes to bench_detail.json instead.
    // Three warm passes, report the mean of passes 2–3 (skip-first
    // over the WARM passes too): round-2 bench_detail showed warm
    // pass 1 still pays multi-second C2/JIT storms for late-compiled
    // queries (q34 60 s vs 1.3 s steady), so averaging pass 1 in
    // misreported steady state by up to 20×. Passes 2–3 are
    // steady-state; their mean halves residual shared-JVM noise.
    val cold = names.map(n => n -> runOnce(n))
    val warm1 = names.map(n => n -> runOnce(n)).toMap
    val warm2 = names.map(n => n -> runOnce(n)).toMap
    val warm3 = names.map(n => n -> runOnce(n)).toMap
    val warm = names.map { n =>
      val (a, b) = (warm2(n), warm3(n))
      n -> (if (a < 0 || b < 0) -1.0 else (a + b) / 2.0)
    }
    def fmt(v: Double) =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val failures = warm.count(_._2 < 0)
    val total = warm.map(_._2).filter(_ >= 0).sum
    def jsFull(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    try {
      val detail =
        s"""{"warm":${jsFull(warm)},"warm1":${jsFull(names.map(n => n -> warm1(n)))},"warm2":${jsFull(names.map(n => n -> warm2(n)))},"warm3":${jsFull(names.map(n => n -> warm3(n)))},"cold":${jsFull(cold)},"sf":"$sfDir"}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      )
    } catch { case _: Throwable => () }
    // The driver captures a bounded output tail (~2.9 KB budget): if
    // the 3-decimal line outgrows it as queries accumulate, degrade
    // per-query precision to 2 decimals; if even that exceeds the
    // budget, drop the per-query map entirely — a parseable headline
    // (total + failures) beats a silently-truncated unparseable line.
    def line(perQuery: String) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failures":$failures,"queries":$perQuery,"sf":"$sfDir"}"""
    def js2(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) =>
        val s =
          if (v < 0) "-1"
          else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
        "\"" + k + "\":" + s
      }.mkString("{", ",", "}")
    val full = line(js(warm))
    val compact = line(js2(warm))
    val out =
      if (full.length <= 2600) full
      else if (compact.length <= 2850) compact
      else line("{}")
    println(out)
    spark.stop()
  }
}
