package graft.ops

import graft.SparkSpec

/** text15: static quality bands partition the corpus exactly. */
class CurriculumSpec extends SparkSpec {

  test("bands partition the corpus and bound their quality ranges") {
    val rows = TextQueries
      .queries("text15_curriculum")(spark, sfDir)
      .collect()
      .map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4))
      )
    val nDocs = graft.Tables(spark, sfDir).documents.count()
    assert(rows.map(_._2).sum === nDocs, "bands must cover every doc")
    assert(rows.length > 1, "fixture collapses to one band")
    rows.foreach { case (bin, _, _, minQ, maxQ) =>
      assert(minQ <= maxQ)
      // band b covers [b/4, (b+1)/4) except the top band's closed end
      assert(minQ >= bin / 4.0 && (bin == 3 || maxQ < (bin + 1) / 4.0),
        s"bin=$bin [$minQ,$maxQ]")
    }
  }
}
