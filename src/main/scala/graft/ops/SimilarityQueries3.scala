package graft.ops

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third similarity batch: binary-quantized retrieval — the
  * bandwidth-extreme end of the quantization spectrum the inventory
  * already walks (float32 sim01 → int8 sim11 → 1 bit here). Sign-bit
  * signatures pack a whole vector into ONE BIGINT, candidate search
  * is XOR + popcount (Hamming), and a float rerank restores ranking
  * quality on the shortlist — the binary-passage-retrieval pattern
  * (Yamada et al. 2021, BPR).
  */
object SimilarityQueries3 {

  type Q = (SparkSession, String) => DataFrame

  /** Sign bits per signature (hyperplanes 0..P−1, the sim04 weight
    * family). 48 of the 63 expressible bits: at 64 fixture dims more
    * planes than dims adds correlated bits, and 48 keeps the whole
    * signature in one BIGINT with headroom.
    */
  private[ops] val BITS = 48

  /** Embedding dimensionality (fixture contract, as sim01-sim23). */
  private val DIMS = 64

  /** Query stride (the sim17 budget device) and shortlist/result sizes. */
  private val STRIDE = 25L
  private[ops] val SHORTLIST = 20
  private[ops] val TOPK = 5

  /** sim24: binary top-k = Hamming shortlist + exact rerank. Stage 1
    * scores EVERY corpus row against every query with one XOR and one
    * popcount over packed sign bits (64 bytes of float → 6 bytes on
    * the wire, integer ALU ops instead of FMA); stage 2 re-scores
    * only the SHORTLIST with true cosine. Integer Hamming ties and
    * float rerank both break on neighbor_id, so the result is exact
    * under any partitioning.
    *
    * Shape at scale: signatures are a fused-codegen map-side
    * expression ([[graft.plans.HyperplaneBands]], one table);
    * queries broadcast; the shortlist window ships ONLY
    * (query_id, neighbor_id, hamming) triples — WindowGroupLimit
    * prunes to per-partition top-C before the exchange — and the
    * rerank joins the C·Q-row shortlist (broadcast) back to the
    * corpus for embeddings, so full vectors never enter a shuffle.
    */
  private val binaryTopK: Q = (s, dir) => {
    val sig = Tables(s, dir).embeddings
      .select(
        col("vec_id"),
        col("embedding"),
        element_at(
          graft.plans.HyperplaneBands(s, col("embedding"), 1, BITS, DIMS),
          1
        ).as("sig")
      )
    val queries = sig
      .filter(pmod(col("vec_id"), lit(STRIDE)) === 0)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        col("sig").as("qsig")
      )
    val wH = Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    val shortlist = sig
      .select(col("vec_id"), col("sig"))
      // materialization barrier (the dedup36 lesson): HyperplaneBands
      // codegens, so the fused nested-loop stage would re-derive the
      // 48-plane signature per (corpus, query) PAIR without an
      // exchange between the projection and the join; the shuffle
      // ships only (vec_id, sig) — two longs a row
      .repartition(col("vec_id"))
      .join(broadcast(queries.select(col("query_id"), col("qsig"))),
        col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        expr("CAST(bit_count(sig ^ qsig) AS INT)").as("hamming")
      )
      .withColumn("__rh", row_number().over(wH))
      .filter(col("__rh") <= SHORTLIST)
      .select("query_id", "neighbor_id", "hamming")
    val wC = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    Tables(s, dir).embeddings
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(shortlist), "neighbor_id")
      .join(broadcast(queries.select(col("query_id"), col("qv"))), "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        col("hamming"),
        graft.plans.CosineSimilarity(s, col("qv"), col("embedding")).as("cos_sim")
      )
      .withColumn("rank", row_number().over(wC).cast("int"))
      .filter(col("rank") <= TOPK)
      .select("query_id", "rank", "neighbor_id", "hamming", "cos_sim")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, Q] = Map(
    "sim24_binary_topk" -> binaryTopK
  )

  /** Mirror of the BITS sign-bit signature (independent re-derivation
    * of the same portable-hash plane weights, as sim04/sim08).
    */
  private def sigSql(v: String): String =
    (0 until BITS)
      .map { g =>
        val w =
          s"(CAST(${PortableHash.sqlH32(s"concat('${g}_', CAST(i AS VARCHAR))")} % 1000 AS DOUBLE) / 1000.0 - 0.5)"
        s"""(CASE WHEN list_aggregate(list_transform(range(0, len($v)),
           |  i -> CAST($v[i+1] AS DOUBLE) * $w), 'sum') >= 0.0
           |  THEN CAST(${1L << g} AS BIGINT) ELSE 0 END)""".stripMargin
      }
      .mkString("(", " + ", ")")

  private def dotSql(a: String, b: String): String =
    s"""list_aggregate(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""(CASE WHEN (${dotSql(a, a)}) = 0.0 OR (${dotSql(b, b)}) = 0.0
       |  THEN 0.0
       |  ELSE (${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))
       |  END)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim24_binary_topk" ->
      s"""WITH sig AS (SELECT vec_id, embedding,
         |               ${sigSql("embedding")} AS sig
         |             FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, sig AS qsig
         |      FROM sig WHERE vec_id % $STRIDE = 0),
         |p AS (SELECT q.query_id, s.vec_id AS neighbor_id,
         |        CAST(bit_count(xor(s.sig, q.qsig)) AS INTEGER) AS hamming
         |      FROM sig s JOIN q ON s.vec_id <> q.query_id),
         |c AS (SELECT query_id, neighbor_id, hamming,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY hamming ASC, neighbor_id ASC) AS rh
         |      FROM p),
         |r AS (SELECT c.query_id, c.neighbor_id, c.hamming,
         |        ${cosSql("e.embedding", "q.qv")} AS cos_sim
         |      FROM c
         |      JOIN embeddings e ON c.neighbor_id = e.vec_id
         |      JOIN q ON c.query_id = q.query_id
         |      WHERE c.rh <= $SHORTLIST)
         |SELECT query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank,
         |  neighbor_id, hamming, cos_sim
         |FROM r
         |QUALIFY rank <= $TOPK
         |ORDER BY query_id, rank""".stripMargin
  )
}
