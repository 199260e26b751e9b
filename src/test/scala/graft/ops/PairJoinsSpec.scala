package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PairJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("property: bucketed window join == naive range join") {
    val genIds = Gen.listOfN(60, Gen.choose(0L, 200L)).map(_.distinct)
    val prop = Prop.forAll(genIds, Gen.choose(1, 25)) { (ids, w) =>
      val df = ids.toDF("id")
      val a = df.select(col("id").as("id_a"))
      val b = df.select(col("id").as("id_b"))
      val bucketed = PairJoins
        .bucketedWindowJoin(a, b, "id_a", "id_b", w)
        .select("id_a", "id_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val naive = (for {
        x <- ids; y <- ids if y > x && y <= x + w
      } yield (x, y)).toSet
      bucketed == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop
    )
    assert(res.passed, res.status.toString)
  }
}
