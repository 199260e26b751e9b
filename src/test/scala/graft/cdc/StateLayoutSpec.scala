package graft.cdc

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class StateLayoutSpec extends SparkSpec {

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed prior run can leave the managed location behind with no
    // catalog entry — saveAsTable then refuses the location
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    )
    val loc = new java.io.File(warehouse, name.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed state tables join without a shuffle on either side") {
    val o = Tables(spark, sfDir).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables(spark, sfDir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
    Seq("orders_b", "lines_b", "lines_b__compact").foreach(dropTable)
    StateLayout.writeBucketed(o, "orders_b", "o_orderkey", 8)
    StateLayout.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lines_b",
      "o_orderkey",
      8
    )
    val joined = spark
      .table("orders_b")
      .join(spark.table("lines_b"), "o_orderkey")
    assert(!hasShuffle(joined), joined.queryExecution.executedPlan.toString)
    assert(joined.count() > 0)

    // the same join on unbucketed sources DOES shuffle
    val plain = o.join(
      l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey"
    )
    assert(hasShuffle(plain))
  }

  test("point lookup against bucketed state returns the 0-or-1 contract") {
    val hit = StateLayout.lookup(spark, "orders_b", "o_orderkey", 1L).collect()
    assert(hit.length <= 1)
    val miss =
      StateLayout.lookup(spark, "orders_b", "o_orderkey", -42L).collect()
    assert(miss.isEmpty)
  }

  test("compaction preserves content and bucketing") {
    val before = spark.table("lines_b").count()
    StateLayout.compact(spark, "lines_b", "o_orderkey", 8)
    assert(spark.table("lines_b").count() === before)
    val joined = spark
      .table("orders_b")
      .join(spark.table("lines_b"), "o_orderkey")
    assert(!hasShuffle(joined))
  }
}
