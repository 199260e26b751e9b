package graft.streaming

import graft.sim.IvfStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.streaming.StreamingQuery

/** Live Structured-Streaming face of the cdc15/cdc16 IVF maintenance:
  * a stream of `(op, vec_id, embedding, seq)` envelopes (`op` ∈
  * {"u", "d"}) applied per micro-batch to an on-disk [[IvfStore]] via
  * `foreachBatch` — upserts and deletes become the store's
  * partition-granular cell rewrites (and, on an indexed store, the
  * sidecar's bucket rewrites), so per-batch I/O is O(touched), never
  * O(store).
  *
  * Within a batch, a key's envelopes resolve to the max-`seq` winner
  * before anything touches disk (an upsert and a delete of the same
  * vec_id in one batch cannot race). ACROSS batches the contract is
  * the plain CDC upsert one — envelopes apply in delivered batch
  * order; a deployment needing cross-batch latest-wins under
  * out-of-order delivery versions the store rows (the
  * [[StreamAggMaintain]] retained-version discipline) — out of scope
  * here, and the spec replays ordered slices.
  *
  * StreamIvfMaintainSpec pins the contract: after
  * `processAllAvailable` over churn waves fed through a MemoryStream,
  * the store AND its sidecar equal a from-scratch
  * [[IvfStore.build]] of the final logical state.
  */
object StreamIvfMaintain {

  /** Apply one micro-batch of envelopes to the store at `path`. */
  def ingest(path: String, cents: DataFrame, batch: DataFrame): Unit = {
    val s = batch.sparkSession
    // per-key winner under seq, materialized once — the delete and
    // upsert sides below must read ONE consistent reduction
    val w = batch
      .groupBy(col("vec_id"))
      .agg(max(struct(col("seq"), col("op"), col("embedding"))).as("__w"))
      .select(
        col("vec_id"),
        col("__w.op").as("op"),
        col("__w.embedding").as("embedding")
      )
      .localCheckpoint(true)
    try {
      val dels = w.filter(col("op") === "d").select("vec_id")
      if (!dels.isEmpty) IvfStore.delete(s, path, dels)
      val ups = w.filter(col("op") === "u").select("vec_id", "embedding")
      if (!ups.isEmpty) IvfStore.upsert(s, path, cents, ups)
    } finally GraftSqlShims.unpersistCheckpoint(w)
  }

  /** The streaming wrapper: `foreachBatch` over an envelope stream;
    * read the store (e.g. [[IvfStore.topK]]) after
    * `processAllAvailable` — the store on disk IS the state, so a
    * restart resumes from the checkpointed source offsets with no
    * rebuild.
    */
  def maintainQuery(
      envelopes: DataFrame,
      path: String,
      cents: DataFrame,
      checkpoint: String
  ): StreamingQuery =
    envelopes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingest(path, cents, batch)
        ()
      }
      .start()
}
