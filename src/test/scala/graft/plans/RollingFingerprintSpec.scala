package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class RollingFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("fused expression equals the composed HOF form on fixtures") {
    val docs = Tables(spark, sfDir).documents
    val diff = docs
      .select(
        TextFunctions.fingerprintRolling(col("text")).as("composed"),
        RollingFingerprint(spark, col("text")).as("fused")
      )
      .filter(col("composed") =!= col("fused"))
      .count()
    assert(diff === 0L)
  }

  test("golden values incl. unicode and degenerate inputs") {
    val rows = Seq(
      "ab",            // (0*31+97)%M=97; (97*31+98)%M=3105
      "  A  B ",       // normalizes to "a b" -> fold over 'a',' ','b'
      "",              // empty -> 0
      "   ",           // all-space -> 0
      "你好",           // CJK codepoints 20320, 22909
      "😀"   // astral emoji U+1F600: ONE codepoint, not two
    ).toDF("text")
      .select(RollingFingerprint(spark, col("text")).as("h"))
      .collect()
      .map(_.getLong(0))
    def fold(cps: Seq[Int]) =
      cps.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(rows(0) === fold(Seq('a'.toInt, 'b'.toInt)))
    assert(rows(1) === fold(Seq('a'.toInt, ' '.toInt, 'b'.toInt)))
    assert(rows(2) === 0L)
    assert(rows(3) === 0L)
    assert(rows(4) === fold(Seq(20320, 22909)))
    assert(rows(5) === fold(Seq(0x1F600)))
  }
}
