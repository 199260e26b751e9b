package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

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

  /** PriorityQueue dequeues its MAX; max by (-score, id) = lowest
    * score, then highest id — i.e. the element to evict. */
  private def worstFirst: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  final case class Buf(var items: List[Scored])

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {

      override def zero: Buf = Buf(Nil)

      private def shrink(q: mutable.PriorityQueue[Scored]): Unit =
        while (q.size > k) q.dequeue()

      override def reduce(b: Buf, a: Scored): Buf = {
        val q = mutable.PriorityQueue(b.items: _*)(worstFirst)
        q.enqueue(a)
        shrink(q)
        Buf(q.toList)
      }

      override def merge(b1: Buf, b2: Buf): Buf = {
        val q = mutable.PriorityQueue(b1.items: _*)(worstFirst)
        b2.items.foreach(q.enqueue(_))
        shrink(q)
        Buf(q.toList)
      }

      override def finish(b: Buf): Seq[Scored] =
        b.items.sortBy(s => (-s.score, s.id))

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
