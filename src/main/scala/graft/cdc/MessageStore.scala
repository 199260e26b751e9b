package graft.cdc

import graft.Schemas.Message
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's serving surface as a typed API (SURVEY.md §7.1.3):
  * `findAll`, `findById` (0-or-1 ⇒ Option), `save`, `update`
  * (absent-key no-op), `delete` (idempotent), `count`, `firstResult`.
  * Mirrors reference MessageController.java:17-45 /
  * MessageResource.java:13-48, DatabaseInfoResource.java:71.
  *
  * State is an immutable `Dataset[Message]`; mutating calls return a
  * new store (functional CDC-apply). Driver-side `.collect`/`.head`
  * happens ONLY in the explicit point-serving calls (`findById`,
  * `firstResult`, `findAll`) — never inside the engine
  * (SURVEY.md §7.4.5).
  */
final case class MessageStore(state: Dataset[Message]) {
  private val spark: SparkSession = state.sparkSession
  import spark.implicits._

  /** Canonical order is `id` (the reference leaves order unspecified —
    * SURVEY.md §2.6; we pin it). */
  def findAll(): Seq[Message] = state.orderBy("id").collect().toSeq

  /** 0-or-1 contract: None on miss (reference `orElse(null)`). */
  def findById(id: Long): Option[Message] =
    state.filter(col("id") === id).limit(1).collect().headOption

  def count(): Long = state.count()

  /** Arbitrary first row, like the reference's `firstResult()` (no
    * ORDER BY) — but pinned to min-id for determinism. */
  def firstResult(): Option[Message] =
    state.orderBy("id").limit(1).collect().headOption

  /** INSERT (upsert form): the new row deterministically replaces any
    * existing row with the same key — never the partition-order
    * roulette of dropDuplicates. Fresh keys via [[MessageStore.nextId]]. */
  def save(m: Message): MessageStore =
    MessageStore(
      state.filter(col("id") =!= m.id).unionByName(Seq(m).toDS())
    )

  /** UPDATE by key — absent key is a no-op (reference
    * MessageController.java:34-40). */
  def update(id: Long, content: String): MessageStore =
    MessageStore(
      state
        .withColumn(
          "content",
          when(col("id") === id, lit(content)).otherwise(col("content"))
        )
        .as[Message]
    )

  /** DELETE by key — idempotent (reference MessageController.java:42-45). */
  def delete(id: Long): MessageStore =
    MessageStore(state.filter(col("id") =!= id).as[Message])

  /** The one genuinely non-distributed semantic: DB-sequence key
    * assignment (SURVEY.md §7.4.1). max+1 per call, serial — matches
    * single-writer sequence semantics; batch ingest should instead use
    * max + row_number per micro-batch.
    */
  def nextId(): Long =
    state.agg(coalesce(max("id"), lit(0L))).as[Long].head() + 1L
}

object MessageStore {
  def fromSeed(spark: SparkSession): MessageStore = {
    import spark.implicits._
    MessageStore(graft.Schemas.seedMessages.toDS())
  }

  /** Bootstrap from a change log (Dataset of ChangeEvent-shaped rows). */
  def fromEvents(events: DataFrame): MessageStore = {
    val spark = events.sparkSession
    import spark.implicits._
    MessageStore(
      Materializer
        .materialize(events)
        .select(col("id").cast("long"), col("content").cast("string"))
        .as[Message]
    )
  }
}
