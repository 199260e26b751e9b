package graft.sim

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog as a mergeable typed Aggregator: M=64 max-rho
  * registers over the portable 32-bit hash, merged by elementwise max
  * — the O(1)-memory distinct-count summary that replaces an exact
  * `COUNT(DISTINCT key)` when the key cardinality is itself too large
  * to shuffle (relative error ≈ 1.04/√M ≈ 13% at M=64; raise M for
  * production precision — the register math is M-independent).
  *
  * Deterministic and ORACLE-EXACT, not just property-tested: the
  * register index is `h mod 64`, rho is 1 + the trailing-zero count
  * of `h div 64` (capped at 27, the hash's remaining width), and the
  * estimate is the RAW HLL harmonic mean alpha·M²/Σ2^−mx with no
  * small-range (linear-counting) correction — every term is a power
  * of two and every constant is derived by the same IEEE expression,
  * so DuckDB reconstructs the estimate bit-for-bit from the same md5
  * hashes (no libm log/pow anywhere). The omitted correction is the
  * documented trade: below ~160 true distincts the raw estimator
  * biases high, which the fixture groups never hit.
  */
object HllAggregator {

  val M = 64
  val RHO_CAP = 27 // h32 is 32 bits; 6 index bits leave 26 payload bits

  /** alpha_64 · 64² — same literal expression the oracle SQL uses. */
  val ALPHA_M2: Double = 0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0

  def rho(w: Long): Int =
    if (w == 0L) RHO_CAP
    else java.lang.Long.numberOfTrailingZeros(w) + 1

  /** Raw-HLL estimate from finished registers. */
  def estimate(regs: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < regs.length) {
      s += 1.0 / (1L << regs(i))
      i += 1
    }
    ALPHA_M2 / s
  }

  /** Sketch aggregator over pre-hashed values (PortableHash.h32). */
  val sketch: Aggregator[Long, Array[Byte], Array[Byte]] =
    new Aggregator[Long, Array[Byte], Array[Byte]] {
      override def zero: Array[Byte] = new Array[Byte](M)

      override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
        val idx = (h % M).toInt
        val r = rho(h / M)
        if (r > b(idx)) b(idx) = r.toByte
        b
      }

      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        var i = 0
        while (i < M) {
          if (b(i) > a(i)) a(i) = b(i)
          i += 1
        }
        a
      }

      override def finish(b: Array[Byte]): Array[Byte] = b

      override def bufferEncoder: Encoder[Array[Byte]] =
        ExpressionEncoder[Array[Byte]]()
      override def outputEncoder: Encoder[Array[Byte]] =
        ExpressionEncoder[Array[Byte]]()
    }

  /** Estimate-valued variant for direct use in an agg column. */
  val distinctEstimate: Aggregator[Long, Array[Byte], Double] =
    new Aggregator[Long, Array[Byte], Double] {
      override def zero: Array[Byte] = sketch.zero
      override def reduce(b: Array[Byte], h: Long): Array[Byte] =
        sketch.reduce(b, h)
      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
        sketch.merge(a, b)
      override def finish(b: Array[Byte]): Double = estimate(b)
      override def bufferEncoder: Encoder[Array[Byte]] =
        ExpressionEncoder[Array[Byte]]()
      override def outputEncoder: Encoder[Double] =
        ExpressionEncoder[Double]()
    }
}
