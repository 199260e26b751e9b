package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (Structured Streaming's unified model: the
  * same plan runs in batch, where `withWatermark` is a no-op — which
  * is how the batch oracle query `stream05` checks the join's
  * event-time semantics).
  *
  * The canonical CDC enrichment: attribute each purchase to the
  * signup it followed within an event-time bound. In streaming
  * execution both sides are watermarked and the time bound is part of
  * the JOIN CONDITION (not a post-filter) — that is what lets the
  * state store evict: a buffered signup row is dropped once the
  * purchase-side watermark passes signup_ts + bound + delay, so state
  * is O(in-flight window), not O(history). The equality key keeps it
  * a hash-partitioned join (both sides shuffle on user key once);
  * never a time-only condition, which would broadcast-nested-loop.
  */
object StreamJoins {

  /** Inner interval join: purchases(user_id, purchase_ts,
    * purchase_event, value) ⋈ signups(s_user, signup_ts,
    * signup_event) on user key with
    * signup_ts ≤ purchase_ts ≤ signup_ts + `boundSeconds`.
    *
    * Watermarks: signups held `boundSeconds + slack` (a signup must
    * stay joinable until the purchase watermark clears its bound);
    * purchases held `slack`.
    */
  def purchaseAttribution(
      purchases: DataFrame,
      signups: DataFrame,
      boundSeconds: Long = 3600L,
      slackSeconds: Long = 600L
  ): DataFrame = {
    val p = purchases.withWatermark("purchase_ts", s"$slackSeconds seconds")
    val s = signups.withWatermark(
      "signup_ts",
      s"${boundSeconds + slackSeconds} seconds"
    )
    p.join(
      s,
      col("s_user") === col("user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $boundSeconds SECONDS")
    )
  }

  /** LEFT OUTER flavor, signups preserved: every signup row emits —
    * joined to each purchase inside its attribution window, or
    * null-padded if none arrives. In streaming execution the
    * null-padded row CANNOT be emitted eagerly (a matching purchase
    * may still come): it materializes only once the watermark passes
    * `signup_ts + bound + delay`, i.e. once the state store PROVES no
    * match can arrive while evicting the buffered signup — the same
    * eviction the inner join does, re-used as the completeness proof.
    * That makes outer results append-mode and watermark-bounded:
    * state is O(in-flight window), null padding is late by exactly
    * the watermark delay, and a replay of the full feed equals the
    * batch left join (StreamOuterJoinSpec drives this live, sentinel
    * rows advancing the watermark past the last real signup).
    */
  def purchaseAttributionOuter(
      purchases: DataFrame,
      signups: DataFrame,
      boundSeconds: Long = 3600L,
      slackSeconds: Long = 600L
  ): DataFrame = {
    val p = purchases.withWatermark("purchase_ts", s"$slackSeconds seconds")
    val s = signups.withWatermark(
      "signup_ts",
      s"${boundSeconds + slackSeconds} seconds"
    )
    s.join(
      p,
      col("s_user") === col("user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $boundSeconds SECONDS"),
      "left_outer"
    )
  }

  /** FULL OUTER flavor — both sides preserved: unmatched signups AND
    * unattributed purchases each emit one null-padded row once their
    * side's state eviction proves no match can arrive (the same
    * watermark machinery as the left join, applied to both buffers).
    * Completes the stream-stream join-mode matrix next to inner
    * (stream05) and left (stream15).
    */
  def purchaseAttributionFull(
      purchases: DataFrame,
      signups: DataFrame,
      boundSeconds: Long = 3600L,
      slackSeconds: Long = 600L
  ): DataFrame = {
    // symmetric eviction: each side must outlive the other side's
    // join bound, so both watermarks carry bound + slack
    val p = purchases.withWatermark(
      "purchase_ts",
      s"${boundSeconds + slackSeconds} seconds"
    )
    val s = signups.withWatermark(
      "signup_ts",
      s"${boundSeconds + slackSeconds} seconds"
    )
    s.join(
      p,
      col("s_user") === col("user_id") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $boundSeconds SECONDS"),
      "full_outer"
    )
  }
}
