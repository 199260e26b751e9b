package graft.plans

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property parity: every fused codegen expression must equal its
  * composed/staged formulation on adversarial text — mixed unicode,
  * runs of whitespace (spaces, tabs, newlines), leading/trailing
  * space, empty and near-empty strings. The fixtures-based specs pin
  * real-data parity; this pins the edge cases fixtures may miss.
  */
class FusedParityPropSpec extends SparkSpec {
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("the", "Cat", "ÉÎ", "你好", "naïve", "I", "ı", "ß", ""),
    Gen.const("😀x")
  )
  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(" ", "  ", "\t", "\n")).map(_.mkString)
  private val doc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, token)
    seps <- Gen.listOfN(n, ws)
    lead <- Gen.oneOf("", " ", "  ")
    trail <- Gen.oneOf("", " ")
  } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + trail

  test("fused sketches and fingerprint equal composed forms on random text") {
    val prop = Prop.forAll(Gen.listOfN(60, doc)) { texts: List[String] =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")

      val fpDiff = df
        .select(
          TextFunctions.fingerprintRolling(col("text")).as("a"),
          RollingFingerprint(spark, col("text")).as("b")
        )
        .filter(col("a") =!= col("b"))
        .count()

      val shDiff = Dedup
        .simHashAgg(Dedup.withTokens(df, "text"), "doc_id")
        .join(
          df.select(col("doc_id"), SimHash32(spark, col("text")).as("f")),
          "doc_id"
        )
        .filter(col("__simhash") =!= col("f"))
        .count()

      val staged = Dedup.minHashSignatureAgg(
        df.withColumn("__shh", ShingleHashes(spark, col("text"))),
        "doc_id",
        32
      )
      val bandsStaged = staged.select(
        col("doc_id"),
        array((0 until 8).map(b => Dedup.bandSignature(col("__sig"), b, 4)): _*)
          .as("bands")
      )
      val mhDiff = bandsStaged
        .join(
          df.select(
            col("doc_id"),
            MinHashBands(spark, col("text"), 32, 8).as("bands2")
          ),
          "doc_id"
        )
        .filter(col("bands") =!= col("bands2"))
        .count()

      fpDiff == 0L && shDiff == 0L && mhDiff == 0L
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5),
      prop
    )
    assert(res.passed, res.status.toString)
  }
}
