package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection on ingest: the stateful form of
  * the batch MinHash-LSH candidate pass (`Dedup.lshCandidatePairs` /
  * dedup04, which is the oracle-checked batch analogue).
  *
  * Per arriving document the fused `MinHashBands` sketch emits its
  * band signatures map-side; rows shuffle once on (band, band_sig);
  * each bucket's state is the member-id list, and a new arrival emits
  * one candidate pair per existing member — so a duplicate is flagged
  * THE MOMENT it enters the pipeline, against everything ingested
  * before it, without re-scanning history.
  *
  * Bounded state: each bucket keeps at most `cap` member ids
  * (first-seen wins, deterministic). A popular bucket (boilerplate
  * text) stops ACCUMULATING members past the cap but still flags new
  * arrivals against the kept members — the explicit form of the
  * hot-bucket cap/salting discipline the batch operators document.
  * Candidates still need the Jaccard verify (exactly as in dedup04);
  * LSH candidates are a superset of true near-dups.
  *
  * A pair is emitted once PER AGREEING BAND (state is per bucket;
  * cross-bucket dedup inside the stateful op would be global state).
  * Batch dedup04 collapses these with `distinct()`; here the consumer
  * dedups downstream — `dropDuplicates` within a watermark, or just
  * the idempotent verify-and-mark write.
  */
object StreamLshDedup {

  final case class BucketRow(band: Int, band_sig: Long, doc_id: Long)
  final case class CandidatePair(id_a: Long, id_b: Long)

  def candidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 32,
      bands: Int = 8,
      cap: Int = 1024
  ): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ex = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        posexplode_outer(
          graft.plans.MinHashBands(spark, col(textCol), k, bands)
        ).as(Seq("band", "band_sig"))
      )
      // a null text (sketch NULL → outer-explode emits a null band
      // row) or null id must not kill the stream: the non-nullable
      // BucketRow encoder would fail the query permanently on one bad
      // record — and NULL buckets must never pair anyway (the same
      // equi-join NULL semantics PairJoins.bucketedPairs enforces)
      .filter(
        col("band").isNotNull && col("band_sig").isNotNull &&
          col("doc_id").isNotNull
      )
      .select(col("band"), col("band_sig"), col("doc_id"))
      .as[BucketRow]
    ex.groupByKey(r => (r.band, r.band_sig))
      .flatMapGroupsWithState[Seq[Long], CandidatePair](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (_, it, state: GroupState[Seq[Long]]) =>
        val existing = state.getOption.getOrElse(Seq.empty)
        val known = existing.toSet
        // dedup within the batch, deterministic order
        val fresh = it
          .map(_.doc_id)
          .toSeq
          .distinct
          .sorted
          .filterNot(known.contains)
        val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
        var members = existing
        fresh.foreach { id =>
          members.foreach { m =>
            if (m != id)
              out += CandidatePair(math.min(m, id), math.max(m, id))
          }
          if (members.size < cap) members = members :+ id
        }
        state.update(members)
        out.iterator
      }
  }
}
