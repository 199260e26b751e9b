package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal accessor for the package-private `classic.Dataset.ofRows`
  * — the standard wrap-a-LogicalPlan entry point used by Spark
  * extension libraries (graft.plans.AsOfJoin builds its custom
  * logical node through this) — plus the checkpoint-block release
  * that `Dataset.localCheckpoint` has no public inverse for. Nothing
  * else from the private surface is touched.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Release the storage blocks behind a `localCheckpoint(true)`'d
    * DataFrame. A local checkpoint persists a lineage-truncated RDD
    * (MEMORY_AND_DISK) that nothing ever unpersists — iterative
    * algorithms that checkpoint per round strand every superseded
    * round's blocks in executor storage for the life of the session.
    * The checkpointed RDD is the one a `LogicalRDD` leaf wraps;
    * unpersisting it after the successor round is materialized is
    * safe because the lineage-cut RDD is never recomputed.
    *
    * No-op for plans without a `LogicalRDD` leaf (never throws):
    * callers may hand back arbitrary DataFrames.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df match {
      case ds: Dataset[_] =>
        ds.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking)
          case _ => ()
        }
      case _ => ()
    }
}
