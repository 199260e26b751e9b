package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payload with typed metadata") {
    val media = Multimodal.asMediaTable(Tables(spark, sfDir).documents)
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    assert(schema("format") === "string")
    assert(schema("width") === "int")
    val row = media.filter(col("media_id") === 3L).head()
    assert(row.getAs[String]("format") === "jpeg") // 3 % 3 = 0 -> index 1
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("decode stub runs per-partition and is deterministic") {
    val media = Multimodal
      .asMediaTable(Tables(spark, sfDir).documents.limit(20))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 20)
    val f0 = feats.find(_.media_id == 0L).get
    assert(f0.n_bytes > 0)
    assert(f0.feature.length === 8)
    assert(f0.n_frames === (f0.n_bytes + 255) / 256)
    // deterministic: second run identical
    val again = Multimodal.decodeFeatures(media).collect()
      .find(_.media_id == 0L).get
    assert(again.checksum === f0.checksum)
    assert(again.feature.toSeq === f0.feature.toSeq)
  }
}
