package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ENFORCED hot-bucket cap: a degenerate bucket (one band value
  * shared by 10³ docs — the boilerplate shard that survives exact
  * dedup) emits ZERO candidate pairs instead of an O(population)
  * aggregation buffer and ~500k spurious pairs, and surfaces in the
  * audit with its exact population — the batch mirror of
  * StreamLshDedup's bounded per-bucket state. Normal buckets are
  * byte-identical to the uncapped pair set, so the fixture gates
  * (dedup04, mm06…) are unchanged by the default ceiling.
  */
class PairJoinsCapSpec extends SparkSpec {

  private def planted = {
    import spark.implicits._
    // bucket 'hot' holds 1000 members; buckets b0..b9 hold 3 each
    val hot = (0L until 1000L).map(i => ("hot", i))
    val normal = (0 until 10).flatMap(b =>
      (0 until 3).map(j => (s"b$b", 10000L + b * 10 + j)))
    (hot ++ normal).toDF("bucket", "id")
  }

  test("an over-cap bucket emits zero pairs; normal buckets are unchanged") {
    val capped = PairJoins
      .bucketedPairs(planted, Seq("bucket"), "id", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 normal buckets × C(3,2) ordered pairs
    val expect = (0 until 10).flatMap { b =>
      val ids = (0 until 3).map(j => 10000L + b * 10 + j)
      for (a <- ids; c <- ids if c > a) yield (a, c)
    }.toSet
    assert(capped === expect, "the hot bucket must contribute NOTHING")
    // and with the ceiling above the population, the pairs reappear
    val uncapped = PairJoins
      .bucketedPairs(planted, Seq("bucket"), "id", maxBucket = 2000)
      .count()
    assert(uncapped === expect.size + 1000L * 999L / 2)
  }

  test("the audit names the dropped bucket with its exact population") {
    val audit = PairJoins
      .bucketAudit(planted, Seq("bucket"), "id", maxBucket = 100)
      .collect()
    assert(audit.length === 1)
    assert(audit(0).getString(0) === "hot")
    assert(audit(0).getLong(1) === 1000L)
    // nothing over the default ceiling on the planted frame either
    // side of the hot bucket
    assert(PairJoins.bucketAudit(planted, Seq("bucket"), "id").count() === 0L)
  }

  test("NULL buckets pair with nothing and never trip the audit") {
    import spark.implicits._
    val withNulls = planted.unionByName(
      Seq.fill(500)((null: String, -1L)).toDF("bucket", "id"))
    assert(PairJoins
      .bucketedPairs(withNulls, Seq("bucket"), "id", maxBucket = 100)
      .filter(col("id_a") < 0 || col("id_b") < 0).count() === 0L)
    assert(PairJoins
      .bucketAudit(withNulls, Seq("bucket"), "id", maxBucket = 100)
      .count() === 1L)
  }

  test("the fixture's LSH banding is below the default ceiling: capped " +
    "candidates ≡ uncapped (dedup04's gate is unchanged)") {
    val docs = graft.Tables(spark, sfDir).documents
    val buckets = graft.dedup.Dedup.lshBandBuckets(docs, "doc_id", "text")
      .localCheckpoint(true)
    val capped = PairJoins
      .bucketedPairs(buckets, Seq("band", "band_sig"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unlimited = PairJoins
      .bucketedPairs(buckets, Seq("band", "band_sig"), "doc_id",
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === unlimited)
    assert(capped.nonEmpty, "the fixture plants near-dups — candidates exist")
    org.apache.spark.sql.graftshim.GraftSqlShims.unpersistCheckpoint(buckets)
  }
}
