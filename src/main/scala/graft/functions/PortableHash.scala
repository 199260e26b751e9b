package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * `h32` maps a string to a non-negative 32-bit value via the first 8
  * hex digits of MD5 — computable bit-identically in Spark
  * (`conv(substring(md5(x),1,8),16,10)`) and DuckDB
  * (`CAST('0x'||substr(md5(x),1,8) AS BIGINT)`), which is what lets
  * the MinHash/SimHash/LSH operators be oracle-checked rather than
  * rows-only. Seeded variants prefix the payload with the seed.
  *
  * Scale note: md5 is ~3× slower than murmur3 (`hash()`), but both are
  * per-row CPU with no shuffle; swap in `hash()` via `fast = true`
  * where oracle parity is not required.
  */
object PortableHash {

  /** Non-negative 32-bit hash of a string column, identical in DuckDB. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: seed is mixed in as a `"<seed>:"` prefix. */
  def h32(c: Column, seed: Int): Column =
    h32(concat(lit(s"$seed:"), c))

  /** Plan-build-time evaluation of the same hash (for deterministic
    * constants like LSH hyperplane weights and MinHash permutation
    * coefficients — identical to what `h32`/`sqlH32` compute).
    */
  def h32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** SQL fragments for the DuckDB oracle (keep in lockstep). */
  def sqlH32(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  def sqlH32(e: String, seed: Int): String =
    sqlH32(s"concat('$seed:', $e)")
}
