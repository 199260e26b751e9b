package graft.functions

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Measures what the z-order layout buys: on a 256×256 grid written
  * as many small files (one row group each), a y-only range predicate
  * must let the z-ordered layout's min/max stats skip most row groups
  * while the x-linear layout — the 1-D sort a naive writer produces —
  * skips none (every x-slice file spans the full y range).
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def grid: DataFrame = {
    import spark.implicits._
    spark
      .range(0L, 65536L, 1L, 4)
      .select(
        (col("id") % 256L).as("x"),
        (col("id") / 256L).as("y")
      )
  }

  private def writeSorted(df: DataFrame, sortCol: String, dir: String): Unit =
    df.repartition(1)
      .sortWithinPartitions(sortCol)
      .write
      .option("maxRecordsPerFile", 2048)
      .mode("overwrite")
      .parquet(dir)

  /** Rows surviving parquet row-group pruning = the scan's output. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val scans = exec.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, exec.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout prunes row groups on the non-sorted dimension") {
    val linDir = Files.createTempDirectory("graft-lin").toString
    val zDir = Files.createTempDirectory("graft-z").toString
    writeSorted(grid, "x", linDir)
    writeSorted(
      grid.withColumn("zkey", ZOrder.zorderKey(col("x"), col("y"), 8)),
      "zkey",
      zDir
    )

    val pred = col("y") >= 100L && col("y") <= 107L
    val linRows = scanOutputRows(spark.read.parquet(linDir).filter(pred))
    val zRows =
      scanOutputRows(spark.read.parquet(zDir).select("x", "y").filter(pred))

    // correctness first: both layouts return the identical result set
    assert(
      spark.read.parquet(zDir).filter(pred).count() ===
        spark.read.parquet(linDir).filter(pred).count()
    )
    // x-sorted files all span y=0..255: nothing prunes
    assert(linRows === 65536L, s"linear layout unexpectedly pruned: $linRows")
    // z-ordered files are boxes: the 8-row y band hits a small minority
    assert(zRows <= linRows / 4, s"z=$zRows lin=$linRows")
  }
}
