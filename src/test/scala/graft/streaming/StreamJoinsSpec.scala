package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Stateful stream dedup + event-time interval join over MemoryStreams. */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupWithinWatermark collapses at-least-once redelivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // id 1 delivered three times (in-batch and cross-batch), id 2 once
    mem.addData((1L, "2024-01-01T10:00:00Z"), (1L, "2024-01-01T10:00:00Z"),
      (2L, "2024-01-01T10:00:05Z"))
    mem.addData((1L, "2024-01-01T10:00:01Z"))
    val deduped = StreamJoins.dedupWithinWatermark(
      mem.toDF().toDF("id", "ts").withColumn("event_ts", to_timestamp(col("ts"))),
      idCols = Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDrained(q, 60000)
    val ids = spark.table("dedup").select("id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L))
  }

  test("intervalJoin matches right rows within [leftTs - maxDelay, leftTs]") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String)]    // (click_id, user, ts)
    val buys   = MemoryStream[(Long, Long, String)]    // (buy_id, user, ts)
    clicks.addData((100L, 1L, "2024-01-01T10:10:00Z"), (101L, 2L, "2024-01-01T10:10:00Z"))
    buys.addData(
      (200L, 1L, "2024-01-01T10:05:00Z"),  // 5 min before click  → match
      (201L, 1L, "2024-01-01T09:30:00Z"),  // 40 min before click → outside window
      (202L, 1L, "2024-01-01T10:11:00Z"),  // after the click     → no match
      (203L, 3L, "2024-01-01T10:09:00Z"))  // different user      → no match
    val l = clicks.toDF().toDF("click_id", "user_id", "ts")
      .withColumn("click_ts", to_timestamp(col("ts"))).drop("ts")
    val r = buys.toDF().toDF("buy_id", "user_id", "ts")
      .withColumn("buy_ts", to_timestamp(col("ts"))).drop("ts")
    val joined = StreamJoins.intervalJoin(l, "click_ts", r, "buy_ts",
      keys = Seq("user_id"), maxDelay = "10 minutes", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ijoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    awaitDrained(q, 60000)
    val pairs = spark.table("ijoin").select("click_id", "buy_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((100L, 200L)))
  }
}
