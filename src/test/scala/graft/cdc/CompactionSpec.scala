package graft.cdc

import graft.SparkSpec

/** cdc11: materializing the compacted log must equal materializing
  * the full log — compaction is invisible to every replayer — and the
  * compacted log is never larger than the full one.
  */
class CompactionSpec extends SparkSpec {

  private def materialized(
      log: org.apache.spark.sql.DataFrame
  ): Set[(Long, String, Double)] =
    Materializer
      .materialize(log)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet

  test("replaying the compacted log equals replaying the full log") {
    val full = CdcQueries.changeLog(spark, sfDir)
    val compacted = CdcQueries.queries("cdc11_compaction")(spark, sfDir)
    assert(materialized(compacted) === materialized(full))
  }

  test("compaction never grows the log and drops dead tombstones") {
    val full = CdcQueries.changeLog(spark, sfDir)
    val compacted = CdcQueries.queries("cdc11_compaction")(spark, sfDir)
    val nFull = full.count()
    val nCompacted = compacted.count()
    assert(nCompacted <= nFull)
    // the fixture's prefix has multi-event keys, so compaction must
    // actually shrink something (guards a no-op regression)
    assert(nCompacted < nFull)
  }
}
