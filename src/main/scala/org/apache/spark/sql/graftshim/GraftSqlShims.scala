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
    * Only frames returned DIRECTLY by `localCheckpoint` are released:
    * the analyzed plan must BE a single `LogicalRDD` leaf. Anything
    * else (a union/join over checkpointed leaves, a derived frame) is
    * a no-op — unpersisting every reachable leaf of a composite plan
    * could release blocks a sibling frame still needs, and a
    * lineage-cut RDD can never be recomputed once its blocks are gone.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df match {
      case ds: Dataset[_] =>
        ds.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking)
          case _ => ()
        }
      case _ => ()
    }
}
