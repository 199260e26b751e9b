package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal accessor for the package-private `classic.Dataset.ofRows`
  * — the standard wrap-a-LogicalPlan entry point used by Spark
  * extension libraries (graft.plans.AsOfJoin builds its custom
  * logical node through this). Nothing else from the private surface
  * is touched.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
