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

  test("wide-SimHash admission: incremental equals batch wide-pairs on a replayed day; re-delivery emits nothing") {
    val base = (0 until 12).map(i =>
      s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima token$i")
    val day0 = (0 until 12).map(i => (i.toLong, base(i)))
      .toDF("doc_id", "text")
    val newRows = Seq(
      (100L, base(0)), // exact dup of store doc 0 (store-vs-batch arm)
      (101L, "zulu yankee xray whiskey victor uniform tango sierra"),
      (102L, "zulu yankee xray whiskey victor uniform tango sierra"), // in-batch dup of 101
      (103L, base(3) + " extra"), // near variant of store doc 3
      (104L, "completely different text with its own tokens entirely now"))
    val day1 = newRows.toDF("doc_id", "text")
    val newIds = newRows.map(_._1).toSet
    val store = tmp("widesim") + "/sigs"
    Dedup.buildWideSimhashStore(day0, "doc_id", "text", store)
    val inc = Dedup.simhashWideIncremental(spark, day1, "doc_id", "text",
        store, maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    // the admission orientation: id_b is always the genuinely-new doc
    assert(inc.nonEmpty)
    assert(inc.forall(p => newIds(p._2)), inc.toString)
    // incremental ≡ the BATCH wide operator replaying the whole corpus,
    // restricted to pairs touching a new doc (old-old pairs are
    // history-internal and out of the admission's scope)
    val all = day0.unionByName(day1)
    val expected = Dedup.simhashPairs128(all, "doc_id", "text",
        maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
      .filter(p => newIds(p._1) || newIds(p._2))
    def unordered(s: Set[(Long, Long, Int)]) =
      s.map(p => (math.min(p._1, p._2), math.max(p._1, p._2), p._3))
    assert(unordered(inc) === unordered(expected))
    // both arms fired: the store dup and the in-batch dup, hamming 0
    assert(inc.contains((0L, 100L, 0)))
    assert(inc.contains((101L, 102L, 0)))
    // fold the batch in; a full re-delivery then emits NOTHING (the
    // idempotency the streaming admission's crash story needs)
    Dedup.appendWideSimhashSignatures(spark, day1, "doc_id", "text", store)
    assert(Dedup.simhashWideIncremental(spark, day1, "doc_id", "text",
      store, maxHamming = 6).count() === 0L)
    // store ids folded exactly once
    assert(spark.read.parquet(store).select("id").as[Long].collect().toSet
      === (0L until 12L).toSet ++ newIds)
    Dedup.appendWideSimhashSignatures(spark, day1, "doc_id", "text", store)
    assert(spark.read.parquet(store).count() === 17L)
  }

  test("wide store refuses mismatched signature draws loudly (portable vs production)") {
    // the r12 review finding: build/admission draw families
    // (md5-portable vs xxhash64) are bit-incompatible, and the match
    // was a scaladoc contract only — a mismatched admission computed
    // garbage hamming distances SILENTLY. Now the store records its
    // draws and the admission/append gate on them.
    val docs = (0 until 6).map(i => (i.toLong, s"alpha bravo token$i"))
      .toDF("doc_id", "text")
    val store = tmp("widemeta") + "/sigs"
    Dedup.buildWideSimhashStore(docs, "doc_id", "text", store,
      portable = true)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.simhashWideIncremental(spark,
        Seq((100L, "zulu yankee")).toDF("doc_id", "text"),
        "doc_id", "text", store, maxHamming = 6, portable = false)
    }
    assert(e1.getMessage.contains("portable=true") &&
      e1.getMessage.contains("bit-incompatible"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendWideSimhashSignatures(spark,
        Seq((100L, "zulu yankee")).toDF("doc_id", "text"),
        "doc_id", "text", store, portable = false)
    }
    assert(e2.getMessage.contains("bit-incompatible"))
    // matching draws pass, and the meta dir is invisible to the
    // signature-table read (underscore-prefixed)
    Dedup.appendWideSimhashSignatures(spark,
      Seq((100L, "zulu yankee")).toDF("doc_id", "text"),
      "doc_id", "text", store, portable = true)
    assert(spark.read.parquet(store).columns.toSet ===
      Set("id", "sig0", "sig1"))
    assert(spark.read.parquet(store).count() === 7)
  }

  test("admitWideSimhash: end-to-end streaming wide-SimHash gate drops exactly the pairs' id_b docs") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 12).map(i =>
      s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima token$i")
    val day0 = (0 until 12).map(i => (i.toLong, base(i)))
      .toDF("doc_id", "text")
    val newRows = Seq(
      (100L, base(0)),
      (101L, "zulu yankee xray whiskey victor uniform tango sierra"),
      (102L, "zulu yankee xray whiskey victor uniform tango sierra"),
      (103L, base(3) + " extra"),
      (104L, "completely different text with its own tokens entirely now"))
    val store = tmp("widesim-e2e") + "/sigs"
    Dedup.buildWideSimhashStore(day0, "doc_id", "text", store)
    // expected drops derived from the operator itself (orientation is
    // already pinned by the previous test)
    val dropped = Dedup.simhashWideIncremental(spark,
        newRows.toDF("doc_id", "text"), "doc_id", "text", store,
        maxHamming = 6)
      .select("id_b").as[Long].collect().toSet
    val admittedDir = tmp("widesim-adm")
    val pairsDir = tmp("widesim-pairs")
    val mem = MemoryStream[(Long, String)]
    val q = NearDupStream.admitWideSimhash(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", store,
      admittedDir, pairsDir, checkpoint = tmp("widesim-ckpt"),
      maxHamming = 6,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(newRows: _*)
    q.processAllAvailable()
    q.stop()
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === newRows.map(_._1).toSet -- dropped)
    assert(admitted.contains(101L) && !admitted.contains(100L) &&
      !admitted.contains(102L))
    // the admitted docs' signatures joined the store
    assert(spark.read.parquet(store).select("id").as[Long].collect().toSet
      === (0L until 12L).toSet ++ admitted)
  }
}
