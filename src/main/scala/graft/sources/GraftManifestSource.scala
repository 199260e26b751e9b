package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** `spark.readStream.format("graft-manifest")` — the manifest log as
  * a first-class Structured Streaming source, so ANY sink (memory,
  * foreachBatch, files, another store) can consume the DV-aware
  * change feed with the engine's own checkpointing, triggers, and
  * restart semantics. [[graft.streaming.StreamManifestTail]] remains
  * the store-to-store consumer whose cursor rides the target ledger;
  * this source is the general-purpose face over the same feed.
  *
  * Shape: a V1 streaming `Source` (the Delta-connector pattern), NOT
  * a DSv2 `MicroBatchStream` — deliberately. Each micro-batch IS a
  * distributed query (the logical feed is a full-outer join of the
  * two endpoint states' deltas, [[DeletionVectors.logicalFeed]]);
  * the V1 contract's `getBatch → DataFrame` hands that plan to the
  * engine intact, where DSv2's per-partition readers could only
  * express it by materializing the join somewhere first. Offsets are
  * source VERSIONS (`LongOffset(v)` = "state through commit v"), so
  * the engine's offset log IS the cursor and restarts resume exactly.
  *
  * Batch semantics:
  *   - first batch (no checkpoint): the BASELINE — every live row at
  *     the batch's end version, emitted as inserts (`payload_old`
  *     null), exactly [[graft.streaming.StreamManifestTail]]'s init
  *     contract;
  *   - every later batch: the logical feed over `(start, end]` —
  *     hops TELESCOPE, so a rate-limited drain and a fell-behind
  *     catch-up land on identical cumulative state;
  *   - `maxVersionsPerTrigger` (default unbounded) caps how many
  *     source versions one micro-batch advances once the stream is
  *     running; a restart's first batch telescopes whatever is
  *     pending (correct by the telescoping contract, just bursty).
  *
  * A source vacuumed past the stream's checkpointed offset fails the
  * next batch with an actionable error: unlike the tail (whose view
  * is a pure function of source state and can re-baseline), a
  * generic sink may be append-only — silently re-emitting a baseline
  * would double-count downstream. The operator restarts with a fresh
  * checkpoint to re-baseline deliberately.
  */
class GraftManifestSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def sourceSchema(
      ctx: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): (String, StructType) =
    (shortName(), GraftManifestSource.feedSchema(ctx.sparkSession, parameters))

  override def createSource(
      ctx: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]
  ): Source = new ManifestFeedSource(ctx.sparkSession, parameters)
}

object GraftManifestSource {

  private[sources] def opt(params: Map[String, String], key: String): Option[String] =
    params.get(key).map(_.trim).filter(_.nonEmpty)

  private[sources] def rootOf(params: Map[String, String]): String =
    opt(params, "root").orElse(opt(params, "path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-manifest needs .option(\"root\", <store root>) " +
          "(or .option(\"path\", ...))"))

  private[sources] def extraColsOf(params: Map[String, String]): Seq[String] =
    opt(params, "extraCols").map(_.split(',').map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)

  /** The feed's fixed shape, typed from the STORE's own schema (the
    * payload and extra columns keep their table types).
    */
  private[sources] def feedSchema(
      spark: SparkSession,
      params: Map[String, String]
  ): StructType = {
    val root = rootOf(params)
    val table = opt(params, "table").getOrElse(ManifestStore.MAIN)
    val idCol = opt(params, "idCol").getOrElse("doc_id")
    val payloadCol = opt(params, "payloadCol").getOrElse("n_chars")
    val st = ManifestStore.snapshot(spark, root).state(table)
    val tbl = StructType.fromDDL(st.schemaDdl)
    def f(name: String) = tbl.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' is not in '$table' (${tbl.fieldNames.mkString(",")})"))
    StructType(
      StructField(idCol, f(idCol).dataType) +:
        StructField("payload_new", f(payloadCol).dataType) +:
        StructField("payload_old", f(payloadCol).dataType) +:
        StructField("op", StringType) +:
        extraColsOf(params).map(c => StructField(c, f(c).dataType)))
  }
}

/** One live stream's source instance — see [[GraftManifestSource]]. */
private[sources] class ManifestFeedSource(
    spark: SparkSession,
    params: Map[String, String]
) extends Source {

  private val root = GraftManifestSource.rootOf(params)
  private val table =
    GraftManifestSource.opt(params, "table").getOrElse(ManifestStore.MAIN)
  private val idCol =
    GraftManifestSource.opt(params, "idCol").getOrElse("doc_id")
  private val payloadCol =
    GraftManifestSource.opt(params, "payloadCol").getOrElse("n_chars")
  private val extraCols = GraftManifestSource.extraColsOf(params)
  private val maxVersions = GraftManifestSource
    .opt(params, "maxVersionsPerTrigger").map(_.toLong)
    .getOrElse(Long.MaxValue)

  override val schema: StructType =
    GraftManifestSource.feedSchema(spark, params)

  /** Highest version a batch has named so far — the rate-limit base.
    * Engine-restored offsets flow through [[getBatch]], so a restart
    * re-seeds it before the next [[getOffset]] caps anything.
    */
  @volatile private var lastSeen: Option[Long] = None

  private def ver(o: Offset): Long = o match {
    case l: LongOffset      => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalArgumentException(
      s"unexpected offset ${other.getClass.getName}")
  }

  override def getOffset: Option[Offset] = {
    val vs = ManifestStore.versions(spark, root)
    if (vs.isEmpty) None
    else {
      val latest = vs.last
      val end = lastSeen match {
        case Some(s) if s < latest =>
          math.min(latest, if (Long.MaxValue - maxVersions < s) latest
            else s + maxVersions)
        case Some(s) => s // caught up
        case None    => latest // first trigger / restart: telescope
      }
      Some(LongOffset(end))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    lastSeen = Some(math.max(lastSeen.getOrElse(0L),
      math.max(endV, start.map(ver).getOrElse(0L))))
    val out = start match {
      case None =>
        // the baseline: every live row at endV, as inserts — the
        // same init contract the manifest tail runs
        val snap = ManifestStore.snapshotAt(spark, root, endV)
        val pType = schema("payload_new").dataType
        DeletionVectors.read(snap, table, idCol)
          .select(col(idCol) +:
            col(payloadCol).cast(pType).as("payload_new") +:
            lit(null).cast(pType).as("payload_old") +:
            lit("insert").as("op") +:
            extraCols.map(col): _*)
      case Some(s) =>
        val startV = ver(s)
        val readable = ManifestStore.versions(spark, root)
        require(readable.contains(startV),
          s"graft-manifest: source history at $root was vacuumed past " +
            s"the stream's checkpointed offset v$startV (oldest readable: " +
            s"v${readable.headOption.getOrElse(-1L)}) — the feed base is " +
            "gone. Restart with a fresh checkpoint directory to " +
            "re-baseline, and keep source retention above consumer lag")
        val a = ManifestStore.snapshotAt(spark, root, startV)
        val b = ManifestStore.snapshotAt(spark, root, endV)
        DeletionVectors.logicalFeed(spark, root, a, b, table, idCol,
          payloadCol, extraCols)
          .select(col(idCol) +: col("payload_new") +: col("payload_old") +:
            col("op") +: extraCols.map(col): _*)
    }
    // the engine expects a STREAMING-tagged plan for a v1 source's
    // batch (the Kafka/File source pattern): hand it the feed's own
    // distributed plan, lazily, tagged
    org.apache.spark.sql.graftshim.GraftSqlShims.asStreamingFrame(out)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
