package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q95/q96: the profile's predictions must equal what the predicted
  * operations actually produce.
  */
class JoinEconomicsSpec extends SparkSpec {

  test("q95: predicted self-join cardinality equals the real self-join") {
    val profile = Relational11
      .queries("q95_join_key_profile")(spark, sfDir)
      .agg(sum(col("selfjoin_rows")))
      .head()
      .getLong(0)
    val e = graft.Tables(spark, sfDir).events.select("event_id", "user_id")
    val real = e
      .join(e.withColumnRenamed("event_id", "event_id2"), "user_id")
      .count()
    assert(profile === real, "profile must predict the join exactly")
  }

  test("q96: segment cells partition the user base") {
    val cells = Relational11
      .queries("q96_segment_overlap")(spark, sfDir)
      .collect()
    val users = graft
      .Tables(spark, sfDir)
      .events
      .select("user_id")
      .distinct()
      .count()
    assert(cells.map(_.getLong(3)).sum === users)
    assert(cells.length <= 8)
  }
}
