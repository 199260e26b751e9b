package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.types._

/** Streaming hash-chain maintenance — the live face of batch cdc17:
  * per-key state is O(1) (op count + the chain's running tail
  * string), updated AT INGEST, so tamper-evidence exists the moment
  * an op is applied rather than only when the after-the-fact batch
  * audit runs. A replica acks a batch only after folding it into its
  * chains; diffing two replicas' chain columns then proves (or
  * refutes) that both applied exactly the same op sequence — the
  * boundary where integrity actually matters is ingest, and this is
  * the ingest-time fold.
  *
  * The fold is cdc17's EXACT expression applied per micro-batch: the
  * batch's per-key ops sort by the same (ts, seq, op, content)
  * struct order, render as the same `op|content|seq` strings (value
  * and ts stay out — float/timestamp formatting is not cross-engine
  * stable), and fold left with the carried tail as the accumulator
  * seed — h32(...h32(r₁ ‖ r₂)...) extends to new ops without
  * revisiting history, which is the whole point of a chain. Replay ≡
  * batch cdc17 on the same oracle for ANY split count
  * (StreamHashChainSpec pins splits 1/4/7 and the O(keys) state
  * bound).
  *
  * Ordering contract (the StreamLastTouch/StreamFunnel one): batches
  * arrive in nondecreasing event-time order; a batch boundary never
  * splits a timestamp (the replay slices by ts), so the cross-batch
  * concatenation of per-batch sorts is the batch query's total sort.
  */
object StreamHashChain {

  private val chainSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("n_ops", LongType),
    StructField("tail", StringType)
  ))

  final class State(spark: SparkSession) {
    @volatile private[streaming] var chains: DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], chainSchema)

    private[streaming] def swap(c: DataFrame): Unit = {
      val old = chains
      chains = c.localCheckpoint(true)
      GraftSqlShims.unpersistCheckpoint(old)
    }

    private[streaming] def close(): Unit =
      GraftSqlShims.unpersistCheckpoint(chains)
  }

  def newState(spark: SparkSession): State = new State(spark)

  /** Apply one micro-batch of change-log rows (op, id, content, ts,
    * seq): extend each touched key's chain tail and op count; keys
    * not in the batch keep their state rows untouched. The render,
    * fold, and seal are [[graft.cdc.CdcQueries]]'s ONE definition —
    * replay ≡ batch is structural, not a hand-synced copy. The batch
    * aggregation is eagerly materialized: both the fold join and the
    * untouched anti-join read it, and the ingest hot path must not
    * pay the batch shuffle twice.
    */
  def ingest(state: State, batch: DataFrame): Unit = {
    val g = batch
      .select(
        col("id"),
        struct(col("ts"), col("seq"), col("op"), col("content")).as("r")
      )
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("b_ops"),
        sort_array(collect_list(col("r"))).as("ops")
      )
      .localCheckpoint(true)
    val folded = g
      .join(state.chains, Seq("id"), "left")
      .select(
        col("id"),
        (coalesce(col("n_ops"), lit(0L)) + col("b_ops")).as("n_ops"),
        graft.cdc.CdcQueries
          .chainFold(col("ops"), coalesce(col("tail"), lit("")))
          .as("tail")
      )
    val untouched = state.chains
      .join(g.select("id"), Seq("id"), "left_anti")
    state.swap(untouched.unionByName(folded))
    GraftSqlShims.unpersistCheckpoint(g)
  }

  /** Chains in cdc17's exact output shape (the closing h32 of each
    * tail is computed at read time — the running state keeps the
    * extendable tail, not the sealed chain value).
    */
  def summarize(chains: DataFrame): DataFrame =
    chains.select(
      col("id"),
      col("n_ops"),
      graft.cdc.CdcQueries.chainSeal(col("tail")).as("chain")
    )

  /** Deterministic replay in `splits` time-sliced micro-batches; the
    * maintained chains must equal batch cdc17 for ANY `splits`.
    */
  def replay(changeLog: DataFrame, splits: Int = 5): DataFrame = {
    val spark = changeLog.sparkSession
    val ev = changeLog.withColumn("__ts_us", unix_micros(col("ts")))
    val Array(lo, hi) = ev.agg(min(col("__ts_us")), max(col("__ts_us")))
      .head() match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r                  => Array(r.getLong(0), r.getLong(1))
    }
    val span = hi - lo + 1
    val state = newState(spark)
    (0 until splits).foreach { i =>
      val b0 = lo + span * i / splits
      val b1 = lo + span * (i + 1) / splits
      // NULL-ts rows ride the first batch (coalesce to lo) so replay
      // ingests exactly the rows batch cdc17 sees — a null-hostile
      // range filter would silently drop them from every slice.
      val k = coalesce(col("__ts_us"), lit(lo))
      ingest(state, ev.filter(k >= b0 && k < b1))
    }
    val out = summarize(state.chains).orderBy("id")
    val rows = out.collect()
    state.close()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), out.schema)
  }
}
