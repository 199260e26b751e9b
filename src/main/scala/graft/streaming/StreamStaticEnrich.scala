package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the remaining core Structured
  * Streaming join shape next to stream-stream (stream05) and
  * streaming as-of (stream06): a streaming fact feed joined to a
  * STATIC dimension table. The reference's analogue is every CRUD
  * read that resolves a row against the `message` table's current
  * contents (reference `MessageController.java:27-30`) generalized to
  * the classic serving case: attribute each incoming purchase event
  * to the customer's nation.
  *
  * Execution semantics (and why it scales):
  *  - The join is STATELESS: Structured Streaming plans a stream-
  *    static join per micro-batch against the dim's current snapshot;
  *    no watermark, no join state store, nothing to evict. State cost
  *    is zero regardless of stream history length.
  *  - The dim side is dimension-sized (customer ⋈ nation, both far
  *    under `spark.sql.autoBroadcastJoinThreshold` even at 100 TB
  *    fact scale), so each micro-batch plans a BroadcastHashJoin —
  *    fact rows never shuffle for the join; the only exchange in the
  *    whole pipeline is the final per-nation aggregation, which is
  *    25-key dense. StreamStaticEnrichSpec pins the broadcast in the
  *    micro-batch plan.
  *  - The dim join keys are PRE-PROJECTED to the 3 needed columns
  *    before the join, so the broadcast ships keys + payload only.
  *
  * Batch/stream parity: the same `enrich` plan runs in both modes
  * (unified model); `stream13_static_enrich` executes it in batch
  * against the oracle, the spec replays the fact side through
  * MemoryStream micro-batches and proves the accumulated sink equals
  * the batch answer.
  */
object StreamStaticEnrich {

  /** Purchases (`user_id`, `value`, ...) enriched with the owning
    * nation via customer — broadcast joins, no fact shuffle.
    */
  def enrich(purchases: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val dim = customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .join(
        nation.select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey")
      )
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))
    purchases.join(
      broadcast(dim),
      purchases("user_id") === dim("c_custkey")
    )
  }

  /** The served per-nation rollup (batch face of the streaming sink
    * aggregate): purchase count + exact decimal revenue by nation and
    * market segment.
    */
  def nationRollup(events: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    import graft.ops.Qx
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
    enrich(purchases, customer, nation)
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_purchases"),
        Qx.dsum(col("value"), 2).as("revenue")
      )
      .orderBy("n_name", "c_mktsegment")
  }
}
