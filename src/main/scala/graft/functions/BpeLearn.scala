package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — vocabulary induction over the
  * corpus' token stream (the word-level form of the byte-pair-
  * encoding loop every tokenizer build runs: count adjacent pairs,
  * merge the most frequent, repeat).
  *
  * Each round is ONE corpus pass: the pair histogram is a map-side-
  * combined hash aggregate on the (a, b) struct key, and the argmax
  * is a driver read of a single row (the sanctioned tiny-aggregate
  * collect) with a deterministic tie-break (count desc, then (a, b)
  * asc) so the learned merge table is a pure function of the corpus.
  * The merge application is a per-row greedy left-to-right fold — a
  * pure array expression, no shuffle.
  *
  * At real scale the pair histogram is the only heavy stage (Zipf
  * head keys combine map-side; the reduce moves one row per distinct
  * pair), and k rounds are k passes — the known cost of exact BPE.
  * Production builds amortize by learning on a hash-stratified sample
  * (q54's device) and batching non-overlapping merges per pass — the
  * batched form is real code at the char level
  * (`graft.ops.TextQueries3.bpeBatchedLearn`, gated as
  * `text40_bpe_batch_learn`).
  *
  * This is the WORD-level loop (merges fuse adjacent whitespace
  * tokens — phrase/wordpiece induction, one corpus pass per round).
  * The CHARACTER-level form — symbols within words, learned over the
  * word-frequency dict so each round costs a vocab-sized pass
  * instead of a corpus pass — is `text38_bpe_merges` /
  * `text39_bpe_encode` in [[graft.ops.TextQueries3]], oracle-checked.
  */
object BpeLearn {

  /** Merged tokens keep an internal space, so a merged token can never
    * collide with a raw token (raw tokens are whitespace-split). */
  def mergedToken(a: String, b: String): String = s"$a $b"

  /** Greedy left-to-right single-merge application as a pure array
    * expression: fold the token array, fusing `[... a] + b` into
    * `[... "a b"]`. Greedy non-overlap falls out of the fold: after a
    * fuse the accumulator's tail is the merged token, which compares
    * unequal to `a` unless the merge table genuinely chains (as real
    * BPE does in later rounds).
    */
  def applyMerge(toks: Column, a: String, b: String): Column =
    aggregate(
      toks,
      array().cast("array<string>"),
      (acc, t) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
          concat(
            slice(acc, lit(1), size(acc) - 1),
            array(lit(mergedToken(a, b)))
          )
        ).otherwise(concat(acc, array(t)))
    )

  /** One round's pair histogram: adjacent (a, b) counts. The slice
    * lengths are floored at 0: a 0- or 1-token row has no pairs and
    * must contribute nothing, not crash the pass (slice throws on
    * negative length).
    */
  def pairCounts(docs: DataFrame, tokCol: String): DataFrame =
    docs
      .select(
        explode(
          zip_with(
            slice(col(tokCol), lit(1), greatest(size(col(tokCol)) - 1, lit(0))),
            slice(col(tokCol), lit(2), greatest(size(col(tokCol)) - 1, lit(0))),
            (x, y) => struct(x.as("a"), y.as("b"))
          )
        ).as("p")
      )
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"))

  /** Learn `k` merges over `docs(tokCol: array<string>)`; returns the
    * merge table in learned order and the final tokenization frame.
    */
  def learn(
      docs: DataFrame,
      tokCol: String,
      k: Int
  ): (Seq[(String, String)], DataFrame) = {
    var cur = docs
    val merges = Seq.newBuilder[(String, String)]
    (0 until k).foreach { _ =>
      val top = pairCounts(cur, tokCol)
        .orderBy(col("n").desc, col("p.a").asc, col("p.b").asc)
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val pair = top(0).getStruct(0)
        val (a, b) = (pair.getString(0), pair.getString(1))
        merges += ((a, b))
        val prev = cur
        cur = cur
          .withColumn(tokCol, applyMerge(col(tokCol), a, b))
          .localCheckpoint(true)
        // release the superseded round's checkpoint (the dedup06
        // round discipline; a no-op for the caller's input frame)
        if (prev ne docs)
          org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(prev)
      }
    }
    (merges.result(), cur)
  }
}
