package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text32/33/34 invariants beyond the DuckDB value check. */
class TextBatch3Spec extends SparkSpec {

  test("text32: buckets are pow2 ceilings and token accounting balances") {
    val rows = TextQueries3
      .queries("text32_length_buckets")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getLong(0)
      assert((bucket & (bucket - 1)) == 0L, s"bucket $bucket not a power of 2")
      val nDocs = r.getLong(1)
      val sumTok = r.getLong(2)
      assert(r.getLong(3) === bucket * nDocs)
      assert(r.getLong(4) === bucket * nDocs - sumTok)
      // every doc fits its bucket: waste < nDocs * half the bucket
      // (each doc is > bucket/2 tokens, else it'd be a lower bucket)
      assert(sumTok > nDocs * (bucket / 2), s"doc below bucket floor in $bucket")
      assert(sumTok <= bucket * nDocs)
    }
    val total = rows.map(_.getLong(1)).sum
    val docs = graft.Tables(spark, sfDir).documents.count()
    assert(total === docs, "every doc lands in exactly one bucket")
  }

  test("text33: mask flags are deterministic and positional") {
    val df = TextQueries3.queries("text33_mlm_mask")(spark, sfDir)
    val again = TextQueries3.queries("text33_mlm_mask")(spark, sfDir)
    assert(df.collect().toSeq === again.collect().toSeq, "masking must be replayable")
    val agg = df
      .agg(
        sum(col("n_masked")).as("m"),
        sum(col("n_tokens")).as("n")
      )
      .head()
    val rate = agg.getLong(0).toDouble / agg.getLong(1).toDouble
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate far from 15%")
    // masked text preserves token count
    val bad = df
      .filter(size(split(col("masked_text"), " ")) =!= col("n_tokens"))
      .count()
    assert(bad === 0L, "masking must not change token positions")
  }

  test("text35: PSM reassembles to the original doc") {
    val df = TextQueries3.queries("text35_fim_transform")(spark, sfDir)
    val bad = df
      .select(
        col("n_tokens"),
        col("prefix_len"),
        col("middle_len"),
        // strip sentinels, restore P+M+S token order, compare counts
        size(
          filter(
            split(col("psm_text"), " "),
            t => !t.isin("<fim_prefix>", "<fim_suffix>", "<fim_middle>") &&
              t =!= ""
          )
        ).cast("long").as("n_reassembled")
      )
      .filter(
        col("n_reassembled") =!= col("n_tokens") ||
          col("prefix_len") + col("middle_len") > col("n_tokens") ||
          col("prefix_len") < 0 || col("middle_len") < 0
      )
      .count()
    assert(bad === 0L, "every PSM example must conserve its tokens")
    // spans vary across docs (the hash actually selects)
    val distinctSpans = df.select("prefix_len", "middle_len").distinct().count()
    assert(distinctSpans > 10, "cut points must vary per doc")
  }

  test("text37: packed sequences are exactly full and conserve tokens") {
    val rows = TextQueries3
      .queries("text37_pack_sequences")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // contiguous chunk ids from 0
    assert(rows.map(_._1).toSeq === (0L until rows.length).toSeq)
    // every chunk except the last holds exactly the budget
    rows.init.foreach { case (cid, _, n, _) =>
      assert(n === 512L, s"chunk $cid not full: $n")
    }
    assert(rows.last._3 <= 512L && rows.last._3 > 0L)
    // token conservation vs the corpus
    val total = graft
      .Tables(spark, sfDir)
      .documents
      .select(
        graft.functions.TextFunctions
          .tokenCount(col("text"))
          .cast("long")
          .as("n")
      )
      .agg(sum("n"))
      .head()
      .getLong(0)
    assert(rows.map(_._3).sum === total)
    // the text itself matches its token count
    rows.foreach { case (cid, _, n, txt) =>
      assert(txt.split(" ").length.toLong === n, s"chunk $cid text drifts")
    }
  }

  test("text36: sampling table normalizes and up-weights rare tokens") {
    val rows = TextQueries3
      .queries("text36_neg_sampling")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    // ^0.75 compresses: rare tokens' draw share exceeds their count
    // share, frequent tokens' falls below it
    val totalCnt = rows.map(_._2).sum.toDouble
    val rare = rows.minBy(_._2)
    val freq = rows.maxBy(_._2)
    assert(rare._4 > rare._2 / totalCnt, "rare token must be up-weighted")
    assert(freq._4 < freq._2 / totalCnt, "frequent token must be down-weighted")
    // the libm-free identity: w34^4 == cnt^3 exactly in the integers
    rows.take(50).foreach { case (_, cnt, w34, _) =>
      assert(
        math.abs(math.pow(w34, 4.0 / 3.0) / cnt - 1.0) < 1e-9,
        s"w34 $w34 is not cnt^0.75 of $cnt"
      )
    }
  }

  test("text34: temperature weights normalize and flatten the mixture") {
    val rows = TextQueries3
      .queries("text34_temperature_mix")(spark, sfDir)
      .collect()
    assert(rows.length > 1, "fixture needs >1 language")
    val natSum = rows.map(_.getDouble(3)).sum
    val tempSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(natSum - 1.0) < 1e-9)
    assert(math.abs(tempSum - 1.0) < 1e-9)
    // α = 0.5 flattens: the smallest language gains, the largest loses
    val bySize = rows.sortBy(_.getLong(2))
    assert(bySize.head.getDouble(5) > 1.0, "low-resource lang must upsample")
    assert(bySize.last.getDouble(5) < 1.0, "high-resource lang must downsample")
  }
}
