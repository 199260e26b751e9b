package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KMV ("k minimum values" / bottom-k) distinct sketch over
  * 64-bit hash values — the classic theta-sketch precursor (Bar-Yossef
  * et al. 2002; Beyer et al. 2007): keep the k smallest DISTINCT hash
  * values of a set. Because bottom-k of a set is a pure function of
  * the set, the aggregator is order- and partition-independent (exact
  * same output under any Spark split/merge schedule), which is what
  * lets a KMV query be oracle-checked value-for-value rather than
  * rows-only.
  *
  * Versus `row_number().over(Window.partitionBy(g).orderBy(h)) <= k`:
  * the window form shuffles EVERY distinct hash of a group to one
  * reducer and sorts there; this buffer keeps k longs per map
  * partition and merges — at 100 TB the difference between shuffling
  * ~10¹⁰ hashes per source and shuffling n_partitions·k.
  *
  * The sketches compose downstream without touching the raw sets:
  * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)), so set overlap
  * between groups is estimable from the k-sized sketches alone (see
  * `dedup25_kmv_overlap`).
  */
object BottomKSketch {

  /** `items` sorted DESCENDING (head = current worst = eviction
    * candidate), strictly distinct; `n == items.length` held as a
    * field so the full-buffer fast path is O(1) (the TopKAggregator
    * discipline).
    */
  final case class Buf(var items: List[Long], var n: Int)

  def bottomK(k: Int): Aggregator[Long, Buf, Seq[Long]] =
    new Aggregator[Long, Buf, Seq[Long]] {

      override def zero: Buf = Buf(Nil, 0)

      override def reduce(b: Buf, a: Long): Buf = b.items match {
        // full and a is no better than the current worst (or equal to
        // it): reject in one comparison — the common map-side case
        case worst :: _ if b.n >= k && a >= worst => b
        case _ =>
          val (above, below) = b.items.span(_ > a)
          if (below.nonEmpty && below.head == a) b // already present
          else {
            val merged = above ::: (a :: below)
            // when full, the dropped head is the old worst: `above` is
            // non-empty then, because the fast path rejected a >= worst
            if (b.n + 1 > k) Buf(merged.tail, k) else Buf(merged, b.n + 1)
          }
      }

      override def merge(b1: Buf, b2: Buf): Buf =
        b2.items.foldLeft(b1)(reduce)

      /** Ascending — the natural sketch form (s[k-1] is the kth
        * minimum that a distinct-cardinality estimate would divide by).
        */
      override def finish(b: Buf): Seq[Long] = b.items.reverse

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}
