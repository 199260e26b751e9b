package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental materialized-aggregate maintenance over a CDC stream —
  * the `foreachBatch` form of the batch retract algebra (cdc08): the
  * maintained view `GROUP BY content → (count, sum(value))` is
  * updated per micro-batch from deltas alone; neither the full log
  * nor the full materialized table is ever rescanned.
  *
  * Per batch, against a RETAINED per-key version state (which, unlike
  * [[graft.cdc.Materializer.merge]]'s live-rows-only output, keeps
  * tombstones — a delete must retain its version or an out-of-order
  * pre-delete event would resurrect the key):
  *  1. reduce the batch to its per-key winner under (ts, seq);
  *  2. drop batch winners older than the key's current state version
  *     (LATE ARRIVALS: they lose latest-wins and must not touch the
  *     aggregate — arrival order never changes the result);
  *  3. emit retract/add deltas (retract the previous live row, add
  *     the new live row; D adds nothing, a key whose previous op was
  *     D retracts nothing) in DECIMAL(18,2) so cancellation is exact
  *     in any aggregation order;
  *  4. fold the deltas into the tiny aggregate table and merge the
  *     accepted winners into the key state; both are re-checkpointed
  *     per batch — the aggregate is O(groups), and the key-state
  *     rewrite is the simple dense form (the log-structured segment
  *     discipline of [[StreamMinhashDedup.State]] applies verbatim
  *     when per-batch O(state) I/O matters).
  *
  * Replay of any slicing of the log — including out-of-order
  * slicings — lands on exactly the batch cdc08 aggregate, which is
  * how the spec pins it.
  */
object StreamAggMaintain {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  final class State(spark: SparkSession) {
    private val keySchema = StructType(Seq(
      StructField("id", LongType),
      StructField("op", StringType),
      StructField("content", StringType),
      StructField("value", DoubleType),
      StructField("ts", TimestampType),
      StructField("seq", LongType)
    ))
    private val aggSchema = StructType(Seq(
      StructField("content", StringType),
      StructField("n_rows", LongType),
      StructField("sum_dec", DecimalType(28, 2))
    ))

    private def empty(schema: StructType): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    @volatile private[streaming] var keyState: DataFrame = empty(keySchema)
    @volatile private[streaming] var aggState: DataFrame = empty(aggSchema)

    /** The maintained view (live groups only, double-rendered sum). */
    def aggregate: DataFrame =
      aggState
        .filter(col("n_rows") > 0)
        .select(
          col("content"),
          col("n_rows"),
          col("sum_dec").cast("double").as("sum_value")
        )

    private[streaming] def swap(newKey: DataFrame, newAgg: DataFrame): Unit = {
      val oldK = keyState
      val oldA = aggState
      keyState = newKey.localCheckpoint(true)
      aggState = newAgg.localCheckpoint(true)
      GraftSqlShims.unpersistCheckpoint(oldK)
      GraftSqlShims.unpersistCheckpoint(oldA)
    }

    private[streaming] def close(): Unit = {
      GraftSqlShims.unpersistCheckpoint(keyState)
      GraftSqlShims.unpersistCheckpoint(aggState)
    }
  }

  def newState(spark: SparkSession): State = new State(spark)

  /** Apply one micro-batch of change events
    * `(op, id, content, value, ts, seq)`; returns the updated
    * aggregate view.
    */
  def ingest(state: State, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("ts").desc, col("seq").desc)
    val winners = batch
      .select("op", "id", "content", "value", "ts", "seq")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val prev = state.keyState.select(
      col("id"),
      col("op").as("prev_op"),
      col("content").as("prev_content"),
      col("value").as("prev_value"),
      col("ts").as("prev_ts"),
      col("seq").as("prev_seq")
    )
    // late-arrival gate: a batch winner at or before its key's current
    // version loses latest-wins outright
    val accepted = winners
      .join(prev, Seq("id"), "left")
      .filter(
        col("prev_ts").isNull ||
          col("ts") > col("prev_ts") ||
          (col("ts") === col("prev_ts") && col("seq") > col("prev_seq"))
      )
    val deltas = accepted
      .select(
        explode(
          array(
            when(
              col("prev_op").isNotNull && col("prev_op") =!= "D",
              struct(
                col("prev_content").as("content"),
                lit(-1L).as("dn"),
                (-dec(col("prev_value"))).as("dv")
              )
            ),
            when(
              col("op") =!= "D",
              struct(
                col("content").as("content"),
                lit(1L).as("dn"),
                dec(col("value")).as("dv")
              )
            )
          )
        ).as("d")
      )
      .filter(col("d").isNotNull)
      .select(
        col("d.content").as("content"),
        col("d.dn").as("n_rows"),
        col("d.dv").cast(DecimalType(28, 2)).as("sum_dec")
      )
    val newAgg = state.aggState
      .unionByName(deltas)
      .groupBy(col("content"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_dec")).cast(DecimalType(28, 2)).as("sum_dec")
      )
      .filter(col("n_rows") =!= 0)
    val acceptedKeys = accepted
      .select("id", "op", "content", "value", "ts", "seq")
    val newKey = state.keyState
      .join(acceptedKeys.select("id"), Seq("id"), "left_anti")
      .unionByName(acceptedKeys)
    state.swap(newKey, newAgg)
    state.aggregate
  }

  /** Streaming wrapper: foreachBatch over a change-event stream; the
    * handle's `aggregate` is the maintained view after the last
    * completed batch (read after `processAllAvailable`).
    */
  def maintainQuery(
      events: DataFrame,
      checkpoint: String
  ): (StreamingQuery, State) = {
    val state = newState(events.sparkSession)
    val q = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingest(state, batch)
        ()
      }
      .start()
    (q, state)
  }

  /** Deterministic replay of a change log in `splits` micro-batches
    * sliced by `seq mod splits` — a key's events SPREAD across
    * batches, so the cross-batch retract path is genuinely exercised
    * (id-sliced batches would keep each key whole). `ordered = false`
    * reverses the slice order, delivering many events after newer
    * ones for their key — the adversarial order for the late-arrival
    * gate.
    */
  def replay(log: DataFrame, splits: Int = 4, ordered: Boolean = true): DataFrame = {
    val spark = log.sparkSession
    val state = newState(spark)
    val idx = if (ordered) 0 until splits else (0 until splits).reverse
    idx.foreach { i =>
      ingest(state, log.filter(pmod(col("seq"), lit(splits)) === i))
    }
    val out = state.aggregate.orderBy("content")
    // materialize before releasing the state blocks the view reads
    val rows = out.collect()
    state.close()
    val spark2 = spark
    import spark2.implicits._
    rows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toDF("content", "n_rows", "sum_value")
  }
}
