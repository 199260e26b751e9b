package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector: a deterministic, distributed synthetic
  * `documents` generator — the dsdgen-style component of an engine:
  * at 100 TB you don't copy a test corpus in, you GENERATE it in
  * place, one deterministic slice per task.
  *
  * {{{
  *   spark.read.format("graft-docs")
  *     .option("rows", 100000).option("partitions", 32)
  *     .option("seed", 7).load()
  * }}}
  *
  * Design points (the full V2 read contract, self-contained):
  *   - `planInputPartitions` slices the id range evenly; every task
  *     generates its rows from [[graft.functions.PortableHash]] alone,
  *     so the SAME (rows, seed) always yields the SAME corpus, at any
  *     partition count — reshardable determinism, spec-pinned.
  *   - `SupportsPushDownRequiredColumns`: the reader materializes
  *     ONLY the pruned schema — `select(count(doc_id))` never builds
  *     a text string (the generation cost tracks the projection, the
  *     same property column pruning buys on a parquet scan).
  *   - Rows are emitted as `InternalRow` with UTF8String payloads —
  *     no Row → InternalRow conversion on the hot path.
  */
class SyntheticDocsSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.SCHEMA

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new SyntheticDocsTable(
    properties.getOrDefault("rows", "1000").toLong,
    properties.getOrDefault("partitions", "8").toInt,
    properties.getOrDefault("seed", "0").toInt
  )
}

object SyntheticDocsSource {
  val SCHEMA: StructType = StructType(
    Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)
    )
  )

  private[sources] val LANGS = Array("en", "fr", "de", "es", "zh")
  private[sources] val VOCAB: Array[String] =
    ("the a data table row column scan filter join agg window sort " +
      "hash merge batch stream key value query part order customer " +
      "line spark fast slow big small vector").split(" ")

  /** One doc's token list — a pure function of (seed, doc_id). */
  private[sources] def tokensOf(seed: Int, id: Long): Array[String] = {
    val h0 = graft.functions.PortableHash.h32Local(s"$seed:len:$id")
    val n = 20 + (h0 % 21).toInt // 20..40 tokens
    Array.tabulate(n) { j =>
      val h = graft.functions.PortableHash.h32Local(s"$seed:tok:$id:$j")
      VOCAB((h % VOCAB.length).toInt)
    }
  }

  private[sources] def langOf(seed: Int, id: Long): String =
    LANGS((graft.functions.PortableHash.h32Local(s"$seed:lang:$id") % LANGS.length).toInt)

  private[sources] def sourceOf(seed: Int, id: Long): String =
    "src" + (graft.functions.PortableHash.h32Local(s"$seed:src:$id") % 4)
}

private class SyntheticDocsTable(rows: Long, partitions: Int, seed: Int)
    extends Table
    with SupportsRead {

  override def name(): String = s"graft-docs($rows, seed=$seed)"
  override def schema(): StructType = SyntheticDocsSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions, seed)
}

private class SyntheticDocsScanBuilder(rows: Long, partitions: Int, seed: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  import org.apache.spark.sql.sources._

  private var required: StructType = SyntheticDocsSource.SCHEMA
  // id-range narrowed by pushed doc_id predicates: [lo, hi)
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projection (pure count) keeps one column so rows still flow
    required =
      if (requiredSchema.isEmpty)
        StructType(SyntheticDocsSource.SCHEMA.take(1))
      else requiredSchema

  /** doc_id range predicates narrow [lo, hi) and are FULLY handled
    * here (generation slices outside the range are never planned, let
    * alone generated — the source's analogue of partition pruning);
    * anything else stays with Spark's post-scan Filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer)            => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer)        => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer)           => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer)    => true
      case _                                                                      => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long    => l
      case i: java.lang.Integer => i.toLong
    }
    handled.foreach {
      case EqualTo(_, v)            => lo = math.max(lo, num(v)); hi = math.min(hi, num(v) + 1)
      case GreaterThan(_, v)        => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v)           => hi = math.min(hi, num(v))
      case LessThanOrEqual(_, v)    => hi = math.min(hi, num(v) + 1)
      case _                        => ()
    }
    pushed = handled
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).iterator
        .map { i =>
          // intersect each slice with the pushed id range
          val from = math.max(i * per, lo)
          val until = math.min(math.min(rows, (i + 1) * per), hi)
          DocsSlice(from, until, seed)
        }
        .filter(s => s.from < s.until)
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required)
  }
}

private case class DocsSlice(from: Long, until: Long, seed: Int)
    extends InputPartition

private class DocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[DocsSlice]
    new PartitionReader[InternalRow] {
      private var id = s.from - 1
      override def next(): Boolean = { id += 1; id < s.until }
      override def get(): InternalRow = {
        // generate only what the projection asks for
        lazy val toks = SyntheticDocsSource.tokensOf(s.seed, id)
        lazy val text = toks.mkString(" ")
        InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "doc_id"  => id
          case "text"    => UTF8String.fromString(text)
          case "lang"    => UTF8String.fromString(SyntheticDocsSource.langOf(s.seed, id))
          case "source"  => UTF8String.fromString(SyntheticDocsSource.sourceOf(s.seed, id))
          case "n_chars" => text.length.toLong
          case other     => throw new IllegalArgumentException(other)
        }))
      }
      override def close(): Unit = ()
    }
  }
}
