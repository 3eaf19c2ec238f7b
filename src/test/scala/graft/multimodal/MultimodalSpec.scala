package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("binary asset plumbing: schema, partition-batched decode, determinism") {
    implicit val s = spark
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    assert(assets.schema.fieldNames.toSeq ===
      Seq("asset_id", "mime", "payload", "source"))
    val decoded = Multimodal.decodeAssets(assets)
    val rows = decoded.collect()
    assert(rows.length === 50)
    // deterministic: same payload ⇒ same features
    val again = Multimodal.decodeAssets(assets).collect()
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
    // fake decode is length-derived
    rows.foreach { r =>
      assert(r.width === 64 + r.byte_len % 577)
      assert(r.features.length === 8)
    }
    // no shuffle: decode preserves input partitioning
    assert(decoded.rdd.getNumPartitions === assets.rdd.getNumPartitions)
  }
}
