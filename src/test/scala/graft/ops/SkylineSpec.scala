package graft.ops

import graft.SparkSpec

/** q67: the sort-based linear skyline must equal the quadratic
  * NOT-EXISTS definition (no other order strictly earlier AND
  * strictly more expensive) — brute-forced in-test over the sf0.001
  * orders.
  */
class SkylineSpec extends SparkSpec {

  test("linear skyline equals the NOT EXISTS definition") {
    import org.apache.spark.sql.functions._
    val orders = graft
      .Tables(spark, sfDir)
      .orders
      .select(
        col("o_orderkey"),
        // orders carries TIMESTAMP_NTZ; session is pinned UTC so the
        // cast to instant-typed timestamp is lossless
        unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"),
        col("o_totalprice")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = orders
      .filter { case (_, d, p) =>
        !orders.exists { case (_, d2, p2) => d2 < d && p2 > p }
      }
      .map(_._1)
      .toSet
    val got = graft.ops.Relational7
      .queries("q67_skyline")(spark, sfDir)
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(got === expected)
  }
}
