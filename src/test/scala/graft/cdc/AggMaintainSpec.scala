package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** cdc08: retract-stream incremental aggregate maintenance must equal
  * a full recompute over the materialized state (the DuckDB oracle is
  * the cross-engine form of the same check; this spec is the
  * in-engine one, so a divergence pinpoints the delta algebra rather
  * than the oracle mirror).
  */
class AggMaintainSpec extends SparkSpec {

  test("cdc08 incremental deltas equal recompute over materialized state") {
    val got = CdcQueries
      .queries("cdc08_agg_maintain")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val recomputed = Materializer
      .materialize(CdcQueries.changeLog(spark, sfDir))
      .groupBy(col("content"))
      .agg(
        count(lit(1)).as("n_rows"),
        graft.ops.Qx.dsum(col("value")).as("sum_value")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got.nonEmpty, "fixture produced no live groups")
    assert(got === recomputed)
  }

  test("cdc08 deltas net to zero for fully deleted keys") {
    // keys whose last op is D contribute nothing: group counts in the
    // incremental result must all be strictly positive
    val got = CdcQueries.queries("cdc08_agg_maintain")(spark, sfDir)
    assert(got.filter(col("n_rows") <= 0).isEmpty)
  }
}
