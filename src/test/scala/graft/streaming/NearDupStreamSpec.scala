package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The streaming admission gate must equal the batch-mode daily job run
  * once per micro-batch (signatures are pure functions of the text),
  * and re-delivering a micro-batch must not change the store, the
  * admitted feed, or the pairs log. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val history = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "completely unrelated text about spark catalyst optimizer internals"))

  // b1: 10 dups history 0; 11 fresh; 12 dups 11 (rejected with it)
  private val batch1 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (11L, "some fresh text with its very own words in it"),
    (12L, "some fresh text with its very own words in it"))
  // b2: 20 dups the ADMITTED 11 (rejected); 21 fresh
  private val batch2 = Seq(
    (20L, "some fresh text with its very own words in it"),
    (21L, "an entirely different second day document about lakes and hills"))

  test("streaming admission equals per-batch daily jobs; store grows by admitted only") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("nds-store") + "/sigs"
    val admitted = tmp("nds-admitted")
    val pairs = tmp("nds-pairs")
    Dedup.buildSignatureStore(history.toDF("doc_id", "text"),
      "doc_id", "text", store)
    val mem = MemoryStream[(Long, String)]
    val q = NearDupStream.admit(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, admitted, pairs,
      checkpoint = tmp("nds-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // clean feed: earliest-wins admission per batch
    val fed = spark.read.parquet(admitted).select("doc_id")
      .as[Long].collect().toSet
    assert(fed === Set(11L, 21L))
    // the pairs log names every rejection's reason
    val logged = spark.read.parquet(pairs).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(logged === Set((0L, 10L), (11L, 12L), (11L, 20L)))
    // store = history + admitted docs only
    val stored = spark.read.parquet(store).select("id").as[Long].collect().toSet
    assert(stored === Set(0L, 1L, 11L, 21L))

    // ground truth: the batch-mode daily job run twice on a fresh store
    val store2 = tmp("nds-store2") + "/sigs"
    Dedup.buildSignatureStore(history.toDF("doc_id", "text"),
      "doc_id", "text", store2)
    val expected = Seq(batch1, batch2).flatMap { b =>
      val df = b.toDF("doc_id", "text")
      val p = Dedup.minhashLshIncremental(spark, df, "doc_id", "text", store2)
        .as[(Long, Long, Double)].collect().toSeq
      val rejected = p.map(_._2).toSet
      Dedup.appendSignatures(spark,
        df.filter(!col("doc_id").isin(rejected.toSeq: _*)),
        "doc_id", "text", store2)
      p
    }.toSet
    assert(spark.read.parquet(pairs)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet === expected)
    assert(spark.read.parquet(store2).select("id").as[Long].collect().toSet
      === stored)
  }

  test("re-delivered micro-batch converges: same feed, same log, same store") {
    val store = tmp("nds-redeliver") + "/sigs"
    val admitted = tmp("nds-redeliver-adm")
    val pairs = tmp("nds-redeliver-pairs")
    Dedup.buildSignatureStore(history.toDF("doc_id", "text"),
      "doc_id", "text", store)
    def deliver(): Unit = NearDupStream.admitBatch(spark,
      batch1.toDF("doc_id", "text"), 0L, "t0", "doc_id", "text", admitted, pairs,
      b => Dedup.minhashLshIncremental(spark, b, "doc_id", "text", store),
      a => Dedup.appendSignatures(spark, a, "doc_id", "text", store))
    deliver()
    val fed1 = spark.read.parquet(admitted).select("doc_id").as[Long].collect().toSet
    val log1 = spark.read.parquet(pairs).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val n1 = spark.read.parquet(store).count()
    // crash-after-commit re-delivery: the batch runs again in full —
    // admission must not flip even though 11's signatures are now stored
    deliver()
    assert(spark.read.parquet(admitted).select("doc_id").as[Long].collect().toSet
      === fed1)
    assert(fed1 === Set(11L))
    assert(spark.read.parquet(pairs).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet === log1)
    assert(spark.read.parquet(store).count() === n1)
  }

  test("bucketed store admission matches the plain store through the stream wrapper") {
    implicit val sqlCtx = spark.sqlContext
    val admitted = tmp("nds-bkt-adm")
    val pairs = tmp("nds-bkt-pairs")
    Dedup.buildSignatureStoreBucketed(history.toDF("doc_id", "text"),
      "doc_id", "text", "nds_bkt_store", buckets = 4)
    try {
      val mem = MemoryStream[(Long, String)]
      val q = NearDupStream.admitBucketed(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", "nds_bkt_store", buckets = 4, admitted, pairs,
        checkpoint = tmp("nds-bkt-ckpt"),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      q.stop()
      assert(spark.read.parquet(admitted).select("doc_id")
        .as[Long].collect().toSet === Set(11L))
      assert(spark.read.parquet(pairs).select("id_a", "id_b")
        .as[(Long, Long)].collect().toSet === Set((0L, 10L), (11L, 12L)))
      assert(spark.table("nds_bkt_store_sigs").select("id")
        .as[Long].collect().toSet === Set(0L, 1L, 11L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nds_bkt_store_sigs")
      spark.sql("DROP TABLE IF EXISTS nds_bkt_store_bands")
    }
  }
}
