package graft.ops

import graft.SparkSpec
import graft.functions.PortableHash

/** q58/q59/pipe02: the training-data export trio, checked against
  * driver-side reconstructions of the same hashes (the DuckDB oracle
  * is the cross-engine form).
  */
class ExportSpec extends SparkSpec {

  private def h(s: String, seed: Int) = PortableHash.h32Local(s"$seed:$s")

  test("q58 shards by one hash and orders by an independent one") {
    val rows = MiscQueries
      .queries("q58_corpus_shuffle")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val docIds = graft
      .Tables(spark, sfDir)
      .documents
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
    assert(rows.length === docIds.length) // a permutation: no loss, no dup
    assert(rows.map(_._1).toSet === docIds.toSet)
    rows.foreach { case (id, shard, _) =>
      assert(shard === math.floorMod(h(id.toString, 5801), 16))
    }
    // within each shard, pos is contiguous from 1 and follows the
    // independent position hash
    rows.groupBy(_._2).values.foreach { sh =>
      val sorted = sh.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sh.length))
      val keys = sorted.map { case (id, _, _) => (h(id.toString, 5802), id) }
      assert(keys.toSeq === keys.sortBy(identity).toSeq)
    }
  }

  test("q59 epoch counts follow the per-source mixture weight") {
    val rows = MiscQueries
      .queries("q59_mixture_epochs")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((id, src), es) =>
      val hs = math.floorMod(h(src, 5803), 20)
      val expected = 1L + hs / 10 +
        (if (math.floorMod(h(id.toString, 5804), 10) < hs % 10) 1L else 0L)
      assert(es.head._3 === expected, s"doc=$id src=$src")
      assert(es.map(_._4).sorted.toSeq === (1L to expected))
    }
    // the fixture must exercise both the floor(w)=2 and the
    // fractional-draw paths or the weighting is untested
    assert(rows.exists(_._3 >= 2L), "no doc repeated")
  }

  test("pipe02 roundtrip preserves rows and bounds file sizes") {
    val rows = MiscQueries
      .queries("pipe02_shard_write")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.Tables(spark, sfDir).documents.count()
    assert(rows.map(_._2).sum === total)
    rows.foreach { case (shard, nDocs, nFiles) =>
      assert(nFiles === (nDocs + 31) / 32, s"shard=$shard")
    }
  }
}
