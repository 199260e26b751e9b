package graft.info

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-level lineage extraction over real library queries. */
class ColumnLineageSpec extends SparkSpec {

  private def edges(name: String): Set[(String, String, String)] =
    ColumnLineage
      .of(spark, graft.SparkEntry.queries(name)(spark, sfDir))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  test("join+agg lineage: revenue traces to both fact columns, keys to dims") {
    val e = edges("q07_revenue_by_nation")
    // the aggregate traces through the join to the lineitem measures
    assert(e.contains(("revenue", "lineitem", "l_extendedprice")), e.toString)
    assert(e.contains(("revenue", "lineitem", "l_discount")))
    // the group key comes from the nation dim
    assert(e.contains(("n_name", "nation", "n_name")))
    // and nothing attributes revenue to a dim table
    assert(!e.exists(x => x._1 == "revenue" && x._2 == "nation"))
  }

  test("window lineage: running total keeps its measure and key sources") {
    val e = edges("q15_running_total")
    val revSrc = e.filter(_._1 == "running_total").map(x => (x._2, x._3))
    // the measure, plus the partition/order columns that determine the
    // frame (windows are value-dependent on them)
    assert(revSrc.contains(("orders", "o_totalprice")), e.toString)
    assert(revSrc.contains(("orders", "o_custkey")))
  }

  test("ad-hoc expression lineage and the report form") {
    val df = graft
      .Tables(spark, sfDir)
      .lineitem
      .select(
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        lit(1).as("const")
      )
    val e = ColumnLineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e === Set(
      ("disc_price", "lineitem", "l_extendedprice"),
      ("disc_price", "lineitem", "l_discount")
    ), "literal-only columns report no sources")
    val rep = ColumnLineage.report(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(rep("disc_price") === "lineitem.l_discount, lineitem.l_extendedprice")
  }

  test("generator lineage: exploded tokens trace to the text column") {
    val df = graft
      .Tables(spark, sfDir)
      .documents
      .select(
        col("doc_id"),
        explode(split(col("text"), " ")).as("tok")
      )
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
    val e = ColumnLineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // the generated column (and the count over it) must NOT read as
    // literal-sourced — it derives from documents.text
    assert(e.contains(("tok", "documents", "text")), e.toString)
  }

  test("grouping-set lineage: rollup outputs keep their sources") {
    val df = graft
      .Tables(spark, sfDir)
      .orders
      .rollup(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val e = ColumnLineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(e.contains(("o_orderstatus", "orders", "o_orderstatus")), e.toString)
  }
}
