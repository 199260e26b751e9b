package graft.sim

import graft.SparkSpec

/** sim11: int8-quantized top-k against a driver-side brute force using
  * the same quantizer and the same two-multiply de-scaling order.
  */
class QuantizedTopKSpec extends SparkSpec {

  test("sim11 equals brute force quantized ranking") {
    val rows = graft
      .Tables(spark, sfDir)
      .embeddings
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val quant = rows.flatMap { case (id, v) =>
      val absmax = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
      if (absmax > 0)
        Some(
          (
            id,
            absmax,
            v.map(x => math.floor(x.toDouble * (127.0 / absmax) + 0.5).toInt)
          )
        )
      else None
    }
    val queries = quant.filter(q => Seq(0L, 1L, 2L).contains(q._1))
    val expected = queries.flatMap { case (qid, qmax, qq) =>
      quant
        .filter(_._1 != qid)
        .map { case (nid, amax, q) =>
          val dot = qq.zip(q).map { case (a, b) => a.toLong * b.toLong }.sum
          (nid, (dot.toDouble * (qmax / 127.0)) * (amax / 127.0))
        }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(5)
        .zipWithIndex
        .map { case ((nid, s), i) => (qid, nid, i + 1, s) }
    }.toSet
    val got = graft.ops.SimilarityQueries
      .queries("sim11_quantized_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
  }
}
