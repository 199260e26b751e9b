package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregator (SURVEY.md §7.3's planned custom
  * aggregate): keeps the k best (score desc, id asc) scored neighbors
  * per group in O(k) memory with map-side partial aggregation.
  *
  * Versus `row_number().over(Window…) <= k`: the window form sorts
  * every candidate of a group on one reducer; the aggregator keeps k
  * rows per partition and merges heaps — at 100 TB the difference
  * between shuffling all candidates and shuffling n_partitions·k.
  *
  * Determinism: total order is (score desc, id asc), so equal scores
  * tie-break identically to the window formulation — results are
  * oracle-comparable.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  final case class Buf(var items: List[Scored], var n: Int)

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {

      override def zero: Buf = Buf(Nil, 0)

      private def worse(a: Scored, b: Scored): Boolean =
        a.score < b.score || (a.score == b.score && a.id > b.id)

      /** Buffer invariant: items sorted worst-first, n == items.length.
        * The explicit size field makes the full-buffer reject a single
        * comparison (List.size is an O(k) traversal) — the common case
        * on the map side, so per-row cost really is O(1) there.
        */
      override def reduce(b: Buf, a: Scored): Buf =
        b.items match {
          case worst :: _ if b.n >= k && !worse(worst, a) => b
          case _ =>
            val full = b.n >= k
            val kept = if (full) b.items.tail else b.items
            val (below, above) = kept.span(s => worse(s, a))
            Buf(below ::: (a :: above), if (full) b.n else b.n + 1)
        }

      override def merge(b1: Buf, b2: Buf): Buf =
        b2.items.foldLeft(b1)((acc, s) => reduce(acc, s))

      override def finish(b: Buf): Seq[Scored] =
        b.items.sortBy(s => (-s.score, s.id))

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
