package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime answer to the hot-key problem
  * every 100 TB join eventually hits (one customer, one null-ish
  * default, one viral document). The salting helper (`ops.Salting`)
  * is the static answer; this spec pins the dynamic one: a shuffle
  * partition far above the skew threshold is SPLIT by
  * OptimizeSkewedJoin (the SMJ prints `skew=true`), values unchanged.
  * Both answers coexist: salting for known-always-hot keys, AQE for
  * the ones you only find out about at runtime.
  */
class AqeSkewSpec extends SparkSpec {

  test("a hot key is split at runtime: SortMergeJoin(skew=true)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // keep AQE from folding everything into one partition first
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB"
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 300k rows on ONE key, a sprinkle on 100 others
      val fact = spark
        .range(0, 300000)
        .select(
          when(col("id") % 1000 === 0, col("id") % 100 + 1)
            .otherwise(lit(0L))
            .as("k"),
          col("id").as("v")
        )
      val dim = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact
        .join(dim, "k")
        .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("chk"))
      val Array(r) = joined.collect()
      assert(r.getLong(0) === 300000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(
        finalPlan.contains("skew=true"),
        s"no skew-split in final AQE plan:\n$finalPlan"
      )
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
