package graft.multimodal

import graft.SparkSpec

/** mm04: modality-pairing coverage vs a driver-side brute force. */
class PairingSpec extends SparkSpec {

  test("coverage equals brute-force doc↔embedding matching") {
    val docs = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vecIds = graft
      .Tables(spark, sfDir)
      .embeddings
      .select("vec_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val expected = docs
      .groupBy(_._2)
      .map { case (src, ds) =>
        val paired = ds.count(d => vecIds(d._1)).toLong
        (src, ds.length.toLong, paired, paired.toDouble / ds.length)
      }
      .toSet
    val got = graft.ops.MiscQueries
      .queries("mm04_pairing")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
  }
}
