package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Latest-wins materialization of a keyed insert/update/delete change
  * stream into its current-state table — the core semantic of the
  * reference's CRUD surface (SURVEY.md §2.9: reference
  * MessageController.java:22-45 / MessageResource.java:18-48 reified
  * as events).
  *
  * Semantics (spec'd per SURVEY.md §7.4.4, property-tested):
  *   - events are ordered per key by (ts, seq) ascending; the greatest
  *     one wins. `seq` is the source offset and breaks equal-ts ties,
  *     so the fold is total and deterministic.
  *   - winning op I/U ⇒ the key is live with that row's payload;
  *     winning op D ⇒ tombstone, key absent from state.
  *   - U/D on an absent key therefore behave as the reference does:
  *     upsert-like U (documented divergence — the reference no-ops;
  *     a CDC log replay cannot distinguish) and idempotent D.
  *
  * Scale posture: one hash shuffle on the key — the minimal possible
  * for this op — then a single window pass per partition. No driver
  * collection, no skew hazard beyond key skew (AQE skew-join handles
  * downstream joins; a hot single key is inherent to the semantic).
  * For incremental/streaming application see
  * [[graft.streaming.CdcStream]], which applies the same reduction
  * per micro-batch against the existing state.
  */
object Materializer {

  /** Reduce a change log to current state.
    *
    * @param events  change log with `opCol` ("I"|"U"|"D"), `keyCol`,
    *                `tsCol`, `seqCol`, plus arbitrary payload columns
    * @return one row per live key: key + payload columns of the
    *         winning event (op/ts/seq/rank dropped)
    */
  def materialize(
      events: DataFrame,
      keyCol: String = "id",
      opCol: String = "op",
      tsCol: String = "ts",
      seqCol: String = "seq",
      keepVersion: Boolean = false
  ): DataFrame = {
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    val winners = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
    if (keepVersion) winners.drop("__rn", opCol)
    else winners.drop("__rn", opCol, tsCol, seqCol)
  }

  /** Merge a delta change log into an existing state table — the
    * `foreachBatch` incremental form; state size governs cost, not
    * total history length.
    *
    * If the state carries version columns (`tsCol`/`seqCol`, as
    * produced by `keepVersion = true`), the merge is a true
    * latest-wins against them: a late event older than a key's
    * current winner LOSES across micro-batches. A plain snapshot
    * without versions is treated as older-than-everything (the only
    * possible reading of an unversioned baseline).
    */
  def merge(
      state: DataFrame,
      delta: DataFrame,
      keyCol: String = "id",
      opCol: String = "op",
      tsCol: String = "ts",
      seqCol: String = "seq"
  ): DataFrame = {
    val versioned =
      state.columns.contains(tsCol) && state.columns.contains(seqCol)
    val payload =
      state.columns.filterNot(c => c == keyCol || c == tsCol || c == seqCol)
    val asEvents = {
      val base = state.withColumn(opCol, lit("I"))
      if (versioned) base
      else
        base
          .withColumn(
            tsCol,
            lit(java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
          )
          .withColumn(seqCol, lit(Long.MinValue))
    }.select(
      col(keyCol) +: payload.map(col) :+ col(opCol) :+ col(tsCol) :+ col(seqCol): _*
    )
    val aligned = delta.select(
      col(keyCol) +: payload.map(col) :+ col(opCol) :+ col(tsCol) :+ col(seqCol): _*
    )
    materialize(
      asEvents.unionByName(aligned),
      keyCol,
      opCol,
      tsCol,
      seqCol,
      keepVersion = true
    )
  }

  /** Distributed DB-sequence key assignment for batch ingest
    * (SURVEY.md §7.4.1; reference semantic: identity-column keys,
    * Message.java:11-13 / import.sql:20-21): each keyless insert in
    * `delta` gets the dense id max(existing) + its 1-based rank under
    * (tsCol, seqCol) — exactly what a single-writer DB sequence would
    * have issued replaying the batch in order.
    *
    * Scale shape: a dense global sequence needs a total order, but NOT
    * a single reducer — `sort` is a parallel range shuffle, and
    * `zipWithIndex` composes per-partition counts into global offsets
    * with one extra (count-only) job; every partition then stamps its
    * rows independently. The base is one scalar aggregate over state
    * per micro-batch — contrast [[MessageStore.nextId]]'s
    * deliberately-serial per-insert form. (ts, seq) must be unique per
    * row (seq is a source offset), so the rank is deterministic.
    */
  def assignIds(
      delta: DataFrame,
      state: DataFrame,
      keyCol: String = "id",
      tsCol: String = "ts",
      seqCol: String = "seq"
  ): DataFrame = {
    val spark = delta.sparkSession
    val base = state
      .agg(coalesce(max(col(keyCol).cast("long")), lit(0L)))
      .head()
      .getLong(0)
    val sorted = delta.sort(col(tsCol).asc, col(seqCol).asc)
    val schema = StructType(
      sorted.schema.fields :+ StructField(keyCol, LongType, nullable = false)
    )
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (base + i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }
}
