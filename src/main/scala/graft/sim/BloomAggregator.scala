package graft.sim

import graft.functions.PortableHash
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter as a mergeable typed Aggregator: M bits × K portable
  * seeded hashes, merged by elementwise OR — the O(1)-memory set
  * membership summary that replaces a broadcast exact set when even
  * the SET itself is too large to ship (dedup10 broadcasts the eval
  * shingle set exactly; this is the drop-in once that set is GBs).
  * One-sided: no false negatives, false-positive rate
  * ≈ (1 − e^(−K·n/M))^K.
  *
  * Deterministic and oracle-reconstructable like the other sketches:
  * bit positions are `h32("<seed>:" || value) mod M` — DuckDB
  * recomputes the same positions from the same md5s, so the probe
  * verdicts (INCLUDING false positives) match bit-for-bit.
  */
object BloomAggregator {

  val BITS = 4096
  val WORDS: Int = BITS / 64
  val K = 3

  def seed(i: Int): Int = 9100 + i

  /** Bit positions of a value (already-hashed inputs rehash the
    * rendered long — lockstep with the SQL mirror).
    */
  def positions(v: Long): Array[Int] =
    Array.tabulate(K)(i =>
      (PortableHash.h32Local(s"${seed(i)}:$v") % BITS).toInt
    )

  def contains(bits: Array[Long], v: Long): Boolean =
    positions(v).forall(p => (bits(p >> 6) >>> (p & 63) & 1L) == 1L)

  /** Sketch aggregator over long values (e.g. shingle hashes). */
  val sketch: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](WORDS)

      override def reduce(b: Array[Long], v: Long): Array[Long] = {
        val ps = positions(v)
        var i = 0
        while (i < K) {
          val p = ps(i)
          b(p >> 6) |= 1L << (p & 63)
          i += 1
        }
        b
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < WORDS) {
          a(i) |= b(i)
          i += 1
        }
        a
      }

      override def finish(b: Array[Long]): Array[Long] = b

      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }
}
