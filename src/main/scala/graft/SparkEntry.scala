package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the mandated extensions); `oracleSql`
  * holds the DuckDB-equivalent SQL for every SQL-expressible query,
  * with column names aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q07_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Relational2.queries ++
      ops.Relational3.queries ++ ops.Relational4.queries ++
      ops.Relational5.queries ++ ops.Relational6.queries ++
      ops.Relational7.queries ++ ops.Relational8.queries ++
      ops.Relational9.queries ++ ops.Relational10.queries ++
      ops.Relational11.queries ++
      ops.BenchAggs.queries ++ cdc.CdcQueries.queries ++
      ops.TextQueries.queries ++ ops.TextQueries2.queries ++
      ops.TextQueries3.queries ++
      ops.DedupQueries.queries ++ ops.DedupQueries2.queries ++
      ops.DedupQueries3.queries ++ ops.DedupQueries4.queries ++
      ops.SimilarityQueries.queries ++ ops.SimilarityQueries2.queries ++
      ops.SimilarityQueries3.queries ++
      ops.StreamQueries.queries ++
      ops.PrivacyQueries.queries ++
      ops.TimeSeriesQueries.queries ++
      ops.MediaQueries.queries ++
      ops.MiscQueries.queries ++
      ops.StorageQueries.queries ++ ops.StorageQueries2.queries ++
      ops.StorageQueries3.queries

  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Relational2.oracle ++
      ops.Relational3.oracle ++ ops.Relational4.oracle ++
      ops.Relational5.oracle ++ ops.Relational6.oracle ++
      ops.Relational7.oracle ++ ops.Relational8.oracle ++
      ops.Relational9.oracle ++ ops.Relational10.oracle ++
      ops.Relational11.oracle ++
      ops.BenchAggs.oracle ++ cdc.CdcQueries.oracle ++
      ops.TextQueries.oracle ++ ops.TextQueries2.oracle ++
      ops.TextQueries3.oracle ++
      ops.DedupQueries.oracle ++ ops.DedupQueries2.oracle ++
      ops.DedupQueries3.oracle ++ ops.DedupQueries4.oracle ++
      ops.SimilarityQueries.oracle ++ ops.SimilarityQueries2.oracle ++
      ops.SimilarityQueries3.oracle ++
      ops.StreamQueries.oracle ++
      ops.PrivacyQueries.oracle ++
      ops.TimeSeriesQueries.oracle ++
      ops.MediaQueries.oracle ++
      ops.MiscQueries.oracle ++
      ops.StorageQueries.oracle ++ ops.StorageQueries2.oracle ++
      ops.StorageQueries3.oracle
}
