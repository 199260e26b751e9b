package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.types._

/** Streaming per-domain URL admission control — the live face of
  * q107's crawl quota, with the semantics a frontier actually runs:
  * FIRST-ARRIVAL admission. q107's batch quota samples a domain's URL
  * space in hash order (the anti-bias offline form); a live frontier
  * cannot reorder the future, so it admits the first Q distinct
  * normalized URLs per domain as they arrive and drops the rest at
  * ingest. State is O(quota) per domain BY CONSTRUCTION — the
  * admitted set (≤ Q skinny rows) plus one reference counter; the
  * seen-but-rejected universe is never stored (a distinct count over
  * it is the HLL/KMV sketches' job, not admission's).
  *
  * Replay ≡ batch: the batch spec of first-arrival admission is
  * "rank a domain's distinct normalized URLs by (first event_id,
  * nurl); admit rank ≤ Q", and the replay must land on it for ANY
  * event_id-ordered split (the stream19/20 discipline; batch
  * boundaries never split an event_id). The output fingerprints the
  * admitted SET order-free — Σ h32(nurl) over admitted — so the gate
  * compares membership, not arrival order.
  */
object StreamUrlQuota {

  private val admittedSchema = StructType(Seq(
    StructField("domain", StringType),
    StructField("nurl", StringType)
  ))

  private val refsSchema = StructType(Seq(
    StructField("domain", StringType),
    StructField("n_refs", LongType)
  ))

  final class State(spark: SparkSession) {
    @volatile private[streaming] var admitted: DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], admittedSchema)
    @volatile private[streaming] var refs: DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], refsSchema)

    private[streaming] def swap(a: DataFrame, r: DataFrame): Unit = {
      val (o1, o2) = (admitted, refs)
      admitted = a.localCheckpoint(true)
      refs = r.localCheckpoint(true)
      GraftSqlShims.unpersistCheckpoint(o1)
      GraftSqlShims.unpersistCheckpoint(o2)
    }

    private[streaming] def close(): Unit = {
      GraftSqlShims.unpersistCheckpoint(admitted)
      GraftSqlShims.unpersistCheckpoint(refs)
    }
  }

  def newState(spark: SparkSession): State = new State(spark)

  /** Apply one micro-batch of (event_id, nurl, domain) rows. The
    * batch is eagerly materialized: the ref counter and the
    * admission candidates both read it, and the ingest hot path must
    * not re-run the caller's lineage twice.
    */
  def ingest(state: State, rawBatch: DataFrame, quota: Long): Unit = {
    val batch = rawBatch.localCheckpoint(true)
    val newRefs = state.refs
      .unionByName(batch.groupBy(col("domain")).agg(count(lit(1)).as("n_refs")))
      .groupBy(col("domain"))
      .agg(sum(col("n_refs")).as("n_refs"))
    // candidates: distinct new nurls by in-batch first arrival, ranked
    // after the domain's current admitted count
    val fresh = batch
      .groupBy(col("domain"), col("nurl"))
      .agg(min(col("event_id")).as("fe"))
      .join(state.admitted, Seq("domain", "nurl"), "left_anti")
    val counts = state.admitted
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_adm"))
    val w = Window
      .partitionBy(col("domain"))
      .orderBy(col("fe").asc, col("nurl").asc)
    val admittedNew = fresh
      .withColumn("rn", row_number().over(w))
      .join(counts, Seq("domain"), "left")
      .filter(col("rn") + coalesce(col("n_adm"), lit(0L)) <= quota)
      .select(col("domain"), col("nurl"))
    state.swap(state.admitted.unionByName(admittedNew), newRefs)
    GraftSqlShims.unpersistCheckpoint(batch)
  }

  /** (domain, n_refs, n_admitted, admitted_fp) — the fingerprint is
    * the order-free Σ h32(nurl) over the admitted set.
    */
  def summarize(state: State): DataFrame =
    state.refs
      .join(
        state.admitted
          .groupBy(col("domain"))
          .agg(
            count(lit(1)).as("n_admitted"),
            sum(graft.functions.PortableHash.h32(col("nurl")))
              .as("admitted_fp")
          ),
        Seq("domain"),
        "left"
      )
      .select(
        col("domain"),
        col("n_refs"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("admitted_fp"), lit(0L)).as("admitted_fp")
      )

  /** Deterministic replay in `splits` event_id-sliced micro-batches;
    * must equal the batch first-arrival quota for ANY `splits`.
    */
  def replay(urls: DataFrame, quota: Long, splits: Int = 5): DataFrame = {
    val spark = urls.sparkSession
    val Array(lo, hi) = urls.agg(min(col("event_id")), max(col("event_id")))
      .head() match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r                  => Array(r.getLong(0), r.getLong(1))
    }
    val span = hi - lo + 1
    val state = newState(spark)
    (0 until splits).foreach { i =>
      val b0 = lo + span * i / splits
      val b1 = lo + span * (i + 1) / splits
      // NULL event_id rides the first batch (coalesce to lo) so no row
      // is silently dropped from every slice by a null-hostile range.
      val k = coalesce(col("event_id"), lit(lo))
      ingest(state, urls.filter(k >= b0 && k < b1), quota)
    }
    val out = summarize(state).orderBy("domain")
    val rows = out.collect()
    state.close()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), out.schema)
  }
}
