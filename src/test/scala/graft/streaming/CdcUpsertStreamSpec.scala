package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.operators.CdcMaterializer

/** Stateful streaming CDC materialization (flatMapGroupsWithState):
  * latest-per-key upserts, delete tombstones, out-of-order absorption,
  * and parity with the batch CdcMaterializer over the same change log. */
class CdcUpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    CdcRecord("person/1", ts("2019-11-13 09:00:00"), 1, "insert", """{"v":1}"""),
    CdcRecord("person/1", ts("2019-11-13 09:05:00"), 2, "update", """{"v":2}"""),
    CdcRecord("person/2", ts("2019-11-13 09:01:00"), 3, "insert", """{"v":9}"""),
    CdcRecord("person/2", ts("2019-11-13 09:06:00"), 4, "delete", """{"v":9}"""),
    CdcRecord("seat/7",   ts("2019-11-13 09:02:00"), 5, "insert", """{"v":5}"""))

  test("latest-per-key upserts with tombstones match the batch materializer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    mem.addData(log: _*)
    val q = CdcUpsertStream.latestByKey(mem.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("upserts")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    awaitDrained(q, 60000)

    // final stream answer: last emission per key, tombstones dropped
    val streamFinal = spark.table("upserts")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("ts").desc)))
      .filter(col("__rn") === 1 && !col("deleted"))
      .select("key", "payload").as[(String, String)].collect().toMap

    val batchFinal = CdcMaterializer.latestSnapshot(
        log.toDF(), Seq("key"), Seq(col("ts"), col("seq")), "op")
      .select("key", "payload").as[(String, String)].collect().toMap

    assert(streamFinal === batchFinal)
    assert(streamFinal === Map(
      "person/1" -> """{"v":2}""", "seat/7" -> """{"v":5}"""))
  }

  test("a straggler older than the stored state emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    val q = CdcUpsertStream.latestByKey(mem.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("straggler")
      .outputMode("update").start()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:10:00"), 2, "update", "new"))
    q.processAllAvailable()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 1, "insert", "old"))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("straggler").select("payload")
      .as[String].collect().toSeq
    assert(emitted === Seq("new")) // the late, older record is absorbed
  }

  test("delete emits a tombstone; a newer re-insert revives the key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    val q = CdcUpsertStream.latestByKey(mem.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("revive")
      .outputMode("update").start()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 1, "insert", "a"))
    q.processAllAvailable()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:01:00"), 2, "delete", "a"))
    q.processAllAvailable()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:02:00"), 3, "insert", "b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("revive").orderBy("ts")
      .select("deleted", "payload").as[(Boolean, String)].collect().toSeq
    assert(rows === Seq((false, "a"), (true, "a"), (false, "b")))
  }

  test("v1: tombstone eviction survives a straggler that would cancel the timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    val q = CdcUpsertStream.latestByKey(mem.toDS(),
        watermark = "0 seconds", retention = "1 second")
      .writeStream.format("memory").queryName("evict_v1")
      .outputMode("update").start()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 1, "delete", "a"))
    q.processAllAvailable()
    // a not-beats straggler for the deleted key (same ts, lower seq —
    // stays above the watermark so it reaches the operator): GroupState
    // clears an un-re-set timeout on every invocation, so without the
    // re-arm this silently cancels the eviction and the tombstone
    // state-store entry leaks forever
    mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 0, "insert", "old"))
    q.processAllAvailable()
    // advance the watermark far past ts + retention, then one more
    // batch so the armed timeout actually fires
    mem.addData(CdcRecord("w", ts("2019-11-13 10:00:00"), 9, "insert", "x"))
    q.processAllAvailable()
    mem.addData(CdcRecord("w", ts("2019-11-13 10:01:00"), 10, "insert", "x"))
    q.processAllAvailable()
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators(0).numRowsTotal
    q.stop()
    assert(stateRows === 1) // only w survives; k's tombstone evicted
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** transformWithState needs RocksDB (column families); scope the
    * provider switch to the block so v1/other tests keep the default. */
  private def withRocksDb[A](f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try f finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("v2 transformWithState materializer matches v1 and the batch form") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    mem.addData(log: _*)
    val q = CdcUpsertStream.latestByKeyV2(mem.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("upserts_v2")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    awaitDrained(q, 60000)
    val v2Final = spark.table("upserts_v2")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("ts").desc)))
      .filter(col("__rn") === 1 && !col("deleted"))
      .select("key", "payload").as[(String, String)].collect().toMap
    assert(v2Final === Map(
      "person/1" -> """{"v":2}""", "seat/7" -> """{"v":5}"""))
    val batchFinal = CdcMaterializer.latestSnapshot(
        log.toDF(), Seq("key"), Seq(col("ts"), col("seq")), "op")
      .select("key", "payload").as[(String, String)].collect().toMap
    assert(v2Final === batchFinal)
  }}

  test("v2: delete tombstone then newer re-insert revives the key") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    val q = CdcUpsertStream.latestByKeyV2(mem.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("revive_v2")
      .outputMode("update").start()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 1, "insert", "a"))
    q.processAllAvailable()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:01:00"), 2, "delete", "a"))
    q.processAllAvailable()
    mem.addData(CdcRecord("k", ts("2019-11-13 09:02:00"), 3, "insert", "b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("revive_v2").orderBy("ts")
      .select("deleted", "payload").as[(Boolean, String)].collect().toSeq
    assert(rows === Seq((false, "a"), (true, "a"), (false, "b")))
  }}

  test("v2: a revive disarms the delete's eviction — straggler cannot resurrect stale state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[CdcRecord]
      val q = CdcUpsertStream.latestByKeyV2(mem.toDS(),
          watermark = "10 minutes", retention = "1 second")
        .writeStream.format("memory").queryName("stale_timer")
        .outputMode("update").start()
      mem.addData(CdcRecord("k", ts("2019-11-13 09:00:00"), 1, "insert", "a"))
      q.processAllAvailable()
      // delete arms an eviction timer at ~09:01:01
      mem.addData(CdcRecord("k", ts("2019-11-13 09:01:00"), 2, "delete", "a"))
      q.processAllAvailable()
      // revive BEFORE the timer can fire (watermark still behind it)
      mem.addData(CdcRecord("k", ts("2019-11-13 09:10:00"), 3, "insert", "b"))
      q.processAllAvailable()
      // other-key records push the watermark past the timer → it fires;
      // the guard must keep the revived state alive
      mem.addData(CdcRecord("w", ts("2019-11-13 09:12:00"), 4, "insert", "w"))
      q.processAllAvailable()
      mem.addData(CdcRecord("w", ts("2019-11-13 09:12:30"), 5, "insert", "w"))
      q.processAllAvailable()
      // straggler above the watermark but older than the revive: must be
      // absorbed (if the timer had wiped state, this would re-emit "stale")
      mem.addData(CdcRecord("k", ts("2019-11-13 09:05:00"), 6, "update", "stale"))
      q.processAllAvailable()
      q.stop()
      val kEmissions = spark.table("stale_timer").filter(col("key") === "k")
        .orderBy("ts").select("deleted", "payload")
        .as[(Boolean, String)].collect().toSeq
      assert(kEmissions === Seq((false, "a"), (true, "a"), (false, "b")))
    }
  }

  test("cdcRecords keys envelopes by schema/table/pk and keeps the op") {
    val env = Seq(
      ("""{"ID": 42, "x": 1}""", "insert", "person", "2019-11-13T09:00:00Z"),
      (null,                     "load",   "person", "2019-11-13T09:00:01Z"))
      .toDF("data", "operation", "table", "tsStr")
      .select(col("data"),
        struct(col("operation"), lit("dms_sample").as("schema-name"),
          col("table").as("table-name")).as("metadata"),
        to_timestamp(col("tsStr")).as("event_ts"))
    val recs = CdcUpsertStream.cdcRecords(env,
      get_json_object(col("data"), "$.ID"), monotonically_increasing_id())
      .collect()
    assert(recs.length === 1) // null data row dropped
    assert(recs.head.key === "dms_sample/person/42")
    assert(recs.head.op === "insert")
  }
}
