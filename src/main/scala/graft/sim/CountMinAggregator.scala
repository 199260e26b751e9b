package graft.sim

import graft.functions.PortableHash
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a mergeable typed Aggregator: DEPTH hash rows
  * × WIDTH counters, one pass over token occurrences, map-side
  * partial sketches merged by elementwise add — the O(1)-memory
  * frequency summary that replaces an exact `groupBy(token)` when the
  * vocabulary itself is too large to shuffle (estimate ≥ exact
  * always; overcount ≤ εN with prob 1−δ for w = e/ε, d = ln 1/δ).
  *
  * Every slot index is derived from the portable md5 hash with seed
  * prefix "<900i>:", so the ENTIRE sketch is reproducible in SQL —
  * `text09_cms_heavy` cross-checks both the sketch table and the
  * min-over-rows estimates against a DuckDB reconstruction, making
  * this sketch oracle-exact, not just property-tested.
  */
object CountMinAggregator {

  val DEPTH = 4
  val WIDTH = 1024

  def seed(i: Int): Int = 9000 + i

  /** Per-thread token→slots memo (token distributions are Zipfian —
    * same discipline as TextSketches' token-hash cache). */
  private val slotCache =
    new ThreadLocal[java.util.HashMap[String, Array[Int]]] {
      override def initialValue() = new java.util.HashMap[String, Array[Int]]()
    }

  def slots(token: String): Array[Int] = {
    val cache = slotCache.get()
    val hit = cache.get(token)
    if (hit != null) return hit
    if (cache.size() >= (1 << 16)) cache.clear()
    val s = Array.tabulate(DEPTH)(i =>
      (PortableHash.h32Local(s"${seed(i)}:$token") % WIDTH).toInt
    )
    cache.put(token, s)
    s
  }

  val sketch: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](DEPTH * WIDTH)

      override def reduce(b: Array[Long], token: String): Array[Long] = {
        val s = slots(token)
        var i = 0
        while (i < DEPTH) {
          b(i * WIDTH + s(i)) += 1L
          i += 1
        }
        b
      }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) {
          a(i) += b(i)
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

  /** Point estimate from a finished sketch: min over rows. */
  def estimate(table: Array[Long], token: String): Long = {
    val s = slots(token)
    var best = Long.MaxValue
    var i = 0
    while (i < DEPTH) {
      val v = table(i * WIDTH + s(i))
      if (v < best) best = v
      i += 1
    }
    best
  }
}
