package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** MinHash-LSH near-duplicate detection on ingest, `foreachBatch`
  * style — the sink-owned-state counterpart of [[StreamLshDedup]]
  * (which keeps its band membership in Spark's state store). Here the
  * accumulated band membership is a DataFrame the batch machinery
  * owns, exactly the shape that becomes a Delta/parquet MERGE target
  * at real scale, and each micro-batch applies the SAME candidate
  * discipline as the oracle-checked batch pass (dedup04 /
  * `Dedup.lshCandidatePairs`): fused map-side sketch, one shuffle on
  * (band, band_sig), pairs only within buckets.
  *
  * Per batch:
  *  1. sketch the arriving docs (fused `MinHashBands`, NULL-hardened);
  *  2. drop (bucket, doc) memberships already in state — re-ingests
  *     are idempotent and never re-emit;
  *  3. emit one candidate pair per (new member × bucket co-member),
  *     including new×new within the batch, deduped to id_a < id_b —
  *     a duplicate is flagged the moment it arrives, against all
  *     history, without rescanning it;
  *  4. fold the new memberships into state, capping each bucket at
  *     `cap` members (first batch, then id order — deterministic).
  *     Over-cap arrivals still PAIR against kept members but stop
  *     accumulating — the hot-bucket (boilerplate) bound.
  *
  * Only buckets the batch touches pay the re-cap window; untouched
  * state rows pass through — the per-batch shuffle is O(batch +
  * touched buckets), not O(state). State is re-checkpointed per batch
  * (superseded blocks released via [[GraftSqlShims]]); each returned
  * pair frame is eagerly materialized so it stays valid after later
  * batches retire the state it was computed from.
  *
  * The accumulated pair set is arrival-order independent (bands are a
  * pure function of text; every co-bucket pair is emitted exactly
  * once, when its later member first arrives) — so the full-corpus
  * replay equals batch dedup04's candidate set, which is how the
  * oracle gate checks it (stream07).
  */
object StreamMinhashDedup {

  private val bandSchema = StructType(Seq(
    StructField("band", IntegerType),
    StructField("band_sig", LongType),
    StructField("doc_id", LongType),
    StructField("seq", LongType)
  ))

  /** Mutable accumulated bucket membership (band, band_sig, doc_id, seq). */
  final class State(spark: SparkSession, val cap: Int) {
    @volatile var bands: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)
  }

  def newState(spark: SparkSession, cap: Int = 1024): State = new State(spark, cap)

  /** Apply one micro-batch of (idCol, textCol) docs; returns the new
    * candidate pairs (id_a < id_b), eagerly materialized.
    */
  def ingest(
      state: State,
      batch: DataFrame,
      batchId: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 32,
      bands: Int = 8
  ): DataFrame = {
    val spark = batch.sparkSession
    // within-batch idempotency (at-least-once delivery can repeat a
    // doc inside one batch) is enforced BEFORE the sketch: one narrow
    // shuffle on the id of the raw rows, not a distinct over the
    // bands×-wider exploded band rows. Docs are immutable by contract
    // (doc_id determines text), so keep-any is deterministic in value.
    // Fused sketch below; NULL-hardened like StreamLshDedup (a null
    // text yields a null band row via the outer explode — it must
    // neither pair nor enter state).
    val sketched = batch
      .filter(col(idCol).isNotNull)
      .dropDuplicates(Seq(idCol))
      .select(
        col(idCol).cast("long").as("doc_id"),
        posexplode_outer(
          graft.plans.MinHashBands(spark, col(textCol), k, bands)
        ).as(Seq("band", "band_sig"))
      )
      .filter(col("band").isNotNull && col("band_sig").isNotNull)
    val prev = state.bands
    val newRows = sketched
      .join(prev, Seq("band", "band_sig", "doc_id"), "left_anti")
    // candidates: new members against ALL current co-members (old
    // state + this batch) — old×old pairs were emitted in their batch
    val coMembers = prev
      .select(col("band"), col("band_sig"), col("doc_id").as("other"))
      .unionByName(
        newRows.select(col("band"), col("band_sig"), col("doc_id").as("other"))
      )
    val pairs = newRows
      .join(coMembers, Seq("band", "band_sig"))
      .filter(col("other") =!= col("doc_id"))
      .select(
        least(col("doc_id"), col("other")).as("id_a"),
        greatest(col("doc_id"), col("other")).as("id_b")
      )
      .distinct()
      .localCheckpoint(true)
    // re-cap ONLY touched buckets; untouched state passes through
    val touched = newRows.select("band", "band_sig").distinct()
    val untouched = prev.join(touched, Seq("band", "band_sig"), "left_anti")
    val w = Window
      .partitionBy(col("band"), col("band_sig"))
      .orderBy(col("seq"), col("doc_id"))
    val recapped = prev
      .join(touched, Seq("band", "band_sig"), "left_semi")
      .unionByName(newRows.withColumn("seq", lit(batchId)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= state.cap)
      .drop("__rn")
    state.bands = untouched.unionByName(recapped).localCheckpoint(true)
    GraftSqlShims.unpersistCheckpoint(prev)
    pairs
  }

  /** Streaming wrapper: foreachBatch over a documents stream; emitted
    * pairs accumulate in the returned state-handle's `pairs` frame.
    */
  final class PairsHandle(spark: SparkSession) {
    @volatile var pairs: DataFrame = {
      val schema = StructType(Seq(
        StructField("id_a", LongType),
        StructField("id_b", LongType)
      ))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  def dedupQuery(
      docs: DataFrame,
      checkpoint: String,
      cap: Int = 1024
  ): (StreamingQuery, PairsHandle) = {
    val spark = docs.sparkSession
    val state = newState(spark, cap)
    val handle = new PairsHandle(spark)
    val q = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val newPairs = ingest(state, batch, batchId)
        val prevPairs = handle.pairs
        handle.pairs = prevPairs.unionByName(newPairs).localCheckpoint(true)
        GraftSqlShims.unpersistCheckpoint(prevPairs)
        GraftSqlShims.unpersistCheckpoint(newPairs)
        ()
      }
      .start()
    (q, handle)
  }

  /** Deterministic full-corpus replay in `splits` micro-batches
    * (sliced by doc_id mod) — the batch-mode gate: the accumulated
    * pair set must equal the single-pass batch candidate set
    * regardless of the slicing.
    */
  def replay(docs: DataFrame, splits: Int = 5, cap: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    val state = newState(spark, cap)
    val parts = (0 until splits).map(i =>
      ingest(state, docs.filter(pmod(col("doc_id"), lit(splits)) === i), i.toLong)
    )
    val out = parts.reduce(_ unionByName _)
    GraftSqlShims.unpersistCheckpoint(state.bands)
    out
  }
}
