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
    Scratch.withTempDir("graft-zorder-spec") { path =>
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
    }
  }

  /** The write job must abort (nothing committed) on a bad key; the
    * raise_error surfaces wrapped in Spark's job-failure chain, so
    * match on the message anywhere in the cause chain.
    */
  private def assertWriteRejects(rows: Seq[(java.lang.Long, java.lang.Long)]): Unit = {
    import spark.implicits._
    val bad = rows.toDF("x", "y")
    Scratch.withTempDir("graft-zorder-bad") { path =>
      val e = intercept[Exception] {
        ZorderStore.write(bad, path, "x", "y", bits, bucketBits)
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(
        chain(e).exists(t => Option(t.getMessage).exists(_.contains("alias"))),
        e.toString
      )
    }
  }

  test("out-of-domain keys fail the write loudly (no silent aliasing)") {
    assertWriteRejects(Seq((java.lang.Long.valueOf(1L << bits), java.lang.Long.valueOf(5L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(4L))))
  }

  test("NULL keys fail the write loudly (no hive-default-partition black hole)") {
    assertWriteRejects(Seq((null, java.lang.Long.valueOf(5L)),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(4L))))
  }
}
