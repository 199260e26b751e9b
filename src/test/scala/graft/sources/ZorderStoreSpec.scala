package graft.sources

import graft.SparkSpec
import graft.functions.Morton
import org.apache.spark.sql.functions._

/** The store contract behind q102: directory pruning must be VISIBLE
  * in the plan (PartitionFilters), sound (pruned read ≡ full filter),
  * genuinely partial (not "select every bucket"), and the domain
  * guard must fail loudly instead of aliasing.
  */
class ZorderStoreSpec extends SparkSpec {

  private val bits = 14
  private val bucketBits = 6

  private def base = {
    import spark.implicits._
    graft
      .Tables(spark, sfDir)
      .orders
      .select(
        col("o_custkey").cast("long").as("x"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .cast("long")
          .as("y")
      )
  }

  test("tile() inverts the curve: every key lands inside its bucket's tile") {
    val shift = 2 * bits - bucketBits
    // deterministic probe grid over the key plane
    for (x <- Seq(0L, 1L, 150L, 1499L, 4095L, 16383L);
         y <- Seq(0L, 63L, 512L, 2403L, 16383L)) {
      val z = (0 until bits).map { i =>
        ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      }.sum
      val b = z >> shift
      val (xmin, xmax, ymin, ymax) = Morton.tile(b, bits, bucketBits)
      assert(x >= xmin && x <= xmax && y >= ymin && y <= ymax, s"($x,$y) b=$b")
    }
  }

  test("pruned box read ≡ unpruned filter, with PartitionFilters in the plan") {
    val path =
      java.nio.file.Files.createTempDirectory("graft-zorder-spec").toString
    try {
      ZorderStore.write(base, path, "x", "y", bits, bucketBits)
      val (x0, x1, y0, y1) = (0L, 127L, 512L, 1023L)
      val pruned =
        ZorderStore.readBox(spark, path, "x", "y", bits, bucketBits, x0, x1, y0, y1)
      val expected = base
        .filter(col("x").between(x0, x1) && col("y").between(y0, y1))
        .count()
      assert(pruned.count() === expected)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan)
      assert(
        plan.linesIterator
          .filter(_.contains("PartitionFilters"))
          .forall(!_.contains("PartitionFilters: []")),
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
      )
      val selected = Morton.selectBuckets(bits, bucketBits, x0, x1, y0, y1)
      assert(
        selected.size < (1 << bucketBits),
        s"probe must prune some of the ${1 << bucketBits} buckets"
      )
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(path))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("out-of-domain keys fail the write loudly (no silent aliasing)") {
    import spark.implicits._
    val bad = Seq((1L << bits, 5L), (3L, 4L)).toDF("x", "y")
    val path =
      java.nio.file.Files.createTempDirectory("graft-zorder-bad").toString
    try {
      val e = intercept[IllegalArgumentException] {
        ZorderStore.write(bad, path, "x", "y", bits, bucketBits)
      }
      assert(e.getMessage.contains("alias"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files
        .walk(java.nio.file.Paths.get(path))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
