package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change record keyed for stateful materialization.
  * @param seq monotonic per-key tiebreak (the transport sequence number —
  *            the reference's Kinesis per-shard sequence fills this role). */
case class CdcRecord(key: String, ts: Timestamp, seq: Long, op: String,
    payload: String)

/** Per-key state: the latest surviving change. */
case class CdcLatest(ts: Timestamp, seq: Long, op: String, payload: String)

/** One upsert emission: the new latest row for `key`, or a tombstone
  * (`deleted = true`) when the latest operation is a delete. */
case class CdcUpsert(key: String, ts: Timestamp, deleted: Boolean,
    payload: String)

/**
 * Streaming CDC materialization with custom state: the streaming twin of
 * the batch `operators.CdcMaterializer`. The reference appends change
 * records per table and leaves "latest row per key" to the query layer
 * (reference README.md:296-316 appends; SURVEY §7.3 item 3); here the
 * stream itself maintains that answer incrementally via
 * `flatMapGroupsWithState`.
 *
 * Semantics: for each key, keep the newest record by (event time, seq);
 * emit an upsert row only when the newest record in a micro-batch beats
 * the stored state (out-of-order stragglers are absorbed silently).
 * A delete emits a tombstone and schedules state eviction once the
 * watermark passes `ts + retention` — without eviction, deleted keys
 * would hold state-store entries forever, which is the thing that kills
 * this pattern at 100 TB key cardinality.
 *
 * Scale: state is hash-partitioned by key across executors (one shuffle),
 * per-key state is O(1), and the state store checkpoints incrementally —
 * this is the plan that survives 1000 executors, unlike re-running the
 * batch window over an ever-growing log.
 */
object CdcUpsertStream {

  /** Envelope stream (`parseEnvelopes` shape) → keyed [[CdcRecord]]s.
    * `keyExpr` extracts the primary key from the `data` JSON string,
    * e.g. `get_json_object(col("data"), "$.ID")`; the key is prefixed
    * with the table name so one stream materializes all tables. */
  def cdcRecords(envelopes: DataFrame, keyExpr: org.apache.spark.sql.Column,
      seqExpr: org.apache.spark.sql.Column): Dataset[CdcRecord] = {
    import envelopes.sparkSession.implicits._
    envelopes
      // ts/seq nullability is filtered HERE, not trusted downstream: a
      // malformed envelope timestamp (to_timestamp → NULL) or
      // non-numeric seq would otherwise reach the stateful operator as
      // a poison pill — maxBy NPEs, the micro-batch fails, and the
      // re-delivered batch fails again forever. Rows dropped here are
      // the splitStreamWithErrors error-routing's concern, not the
      // materializer's.
      .filter(col("data").isNotNull && keyExpr.isNotNull &&
        col("event_ts").isNotNull && seqExpr.cast("long").isNotNull)
      .select(
        concat_ws("/", col("metadata.`schema-name`"),
          col("metadata.`table-name`"), keyExpr.cast("string")).as("key"),
        col("event_ts").as("ts"),
        seqExpr.cast("long").as("seq"),
        col("metadata.operation").as("op"),
        col("data").as("payload"))
      .as[CdcRecord]
  }

  /**
   * @param records   watermark-able keyed change stream
   * @param watermark max event-time lateness absorbed before state
   *                  decisions become final
   * @param retention how long a deleted key's tombstone state survives
   *                  past the watermark (late re-inserts within this
   *                  horizon still compare against the delete)
   */
  def latestByKey(records: Dataset[CdcRecord],
      watermark: String = "10 minutes",
      retention: String = "1 hour"): Dataset[CdcUpsert] = {
    import records.sparkSession.implicits._
    val retMs = parseDurationMs(retention)
    records
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcLatest, CdcUpsert](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[CdcRecord], state: GroupState[CdcLatest]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val newest = rows.maxBy(r => (r.ts.getTime, r.seq))
            val beats = state.getOption.forall(cur =>
              newest.ts.getTime > cur.ts.getTime ||
                (newest.ts.getTime == cur.ts.getTime && newest.seq > cur.seq))
            val out =
              if (!beats) Iterator.empty
              else {
                state.update(CdcLatest(newest.ts, newest.seq, newest.op,
                  newest.payload))
                Iterator.single(CdcUpsert(key, newest.ts,
                  newest.op == "delete", newest.payload))
              }
            // v1 GroupState CLEARS an armed timeout on every invocation
            // that does not re-set it (GroupStateImpl re-initializes the
            // timestamp per call) — so the eviction timer is re-armed on
            // EVERY invocation whose surviving state is a delete, not
            // just the one that stored it. Without this, a re-delivered
            // delete (or any straggler for the key) silently cancels
            // eviction and the tombstone leaks forever. A revive
            // (non-delete survivor) leaves the timeout unset, which
            // correctly cancels a pending eviction.
            state.getOption.foreach { cur =>
              if (cur.op == "delete") {
                // the timeout timestamp must sit above the watermark
                val floor = state.getCurrentWatermarkMs() + 1
                state.setTimeoutTimestamp(
                  math.max(cur.ts.getTime + retMs, floor))
              }
            }
            out
          }
      }
  }

  /**
   * The same materialization on the transformWithState v2 state API
   * (Spark 4 `StatefulProcessor`): typed `ValueState` per key, delete
   * eviction via an explicit event-time timer instead of v1's single
   * implicit timeout. Same emissions as [[latestByKey]]; kept alongside
   * it because v2 is where new state features land (TTL, composite
   * state, RocksDB-native layout) while v1 stays frozen.
   *
   * Requires the RocksDB state store (bundled with Spark 4):
   * `spark.sql.streaming.stateStore.providerClass =
   * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
   * — the default HDFS-backed store has no column families. RocksDB is
   * the store you want at 100 TB key cardinality anyway (off-heap,
   * incremental snapshots, changelog checkpointing).
   */
  def latestByKeyV2(records: Dataset[CdcRecord],
      watermark: String = "10 minutes",
      retention: String = "1 hour"): Dataset[CdcUpsert] = {
    import records.sparkSession.implicits._
    val retMs = parseDurationMs(retention)
    records
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .transformWithState(new UpsertProcessor(retMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update)
  }

  private class UpsertProcessor(retMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, CdcRecord, CdcUpsert] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var latest: ValueState[CdcLatest] = _
    // the one armed eviction timer's timestamp (absent = none): lets a
    // re-delete REPLACE its predecessor's timer and a revive CANCEL it,
    // instead of piling one stale timer per delete onto churn-heavy keys
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      latest = getHandle.getValueState[CdcLatest]("latest",
        Encoders.product[CdcLatest], TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def cancelTimer(): Unit =
      if (timerAt.exists()) { getHandle.deleteTimer(timerAt.get()); timerAt.clear() }

    override def handleInputRows(key: String, rows: Iterator[CdcRecord],
        tv: TimerValues): Iterator[CdcUpsert] = {
      val newest = rows.maxBy(r => (r.ts.getTime, r.seq))
      val beats = !latest.exists() || {
        val cur = latest.get()
        newest.ts.getTime > cur.ts.getTime ||
          (newest.ts.getTime == cur.ts.getTime && newest.seq > cur.seq)
      }
      if (!beats) Iterator.empty
      else {
        latest.update(CdcLatest(newest.ts, newest.seq, newest.op, newest.payload))
        if (newest.op == "delete") {
          // evict once the watermark clears ts + retention (timer must
          // sit above the current watermark to ever fire); exactly one
          // timer per key — a newer delete replaces the armed one
          cancelTimer()
          val at = math.max(newest.ts.getTime + retMs,
            tv.getCurrentWatermarkInMs() + 1)
          getHandle.registerTimer(at)
          timerAt.update(at)
        } else cancelTimer() // revive: pending eviction no longer applies
        Iterator.single(CdcUpsert(key, newest.ts,
          newest.op == "delete", newest.payload))
      }
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[CdcUpsert] = {
      // belt-and-braces: with cancel-on-revive a stale timer should not
      // exist, but only evict keys still deleted — a live record must
      // never be wiped (a straggler could then resurrect stale state)
      if (latest.exists() && latest.get().op == "delete") latest.clear()
      timerAt.clear()
      Iterator.empty
    }
  }

  /** "10 minutes" / "1 hour" / "30 seconds" → millis (same interval
    * dialect as watermark strings). */
  private def parseDurationMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0 && iv.days >= 0, s"non-fixed duration: $s")
    iv.days * 24L * 3600 * 1000 + iv.microseconds / 1000
  }
}
