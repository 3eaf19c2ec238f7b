package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stateful stream hygiene + correlation, the two stream-side operators a
 * Kinesis-shaped pipeline needs beyond demux (SURVEY §2.7 streaming row):
 *
 *  - [[dedupWithinWatermark]]: Kinesis/DMS delivery is at-least-once
 *    (producer retries re-emit the same change record — reference
 *    README.md:216 keys records by primary key precisely so consumers
 *    can reconcile); this collapses redeliveries into exactly-once rows
 *    while the watermark bounds the dedup state store — without it,
 *    state grows with the full key cardinality and a 100 TB stream OOMs
 *    its executors.
 *  - [[intervalJoin]]: event-time stream-stream correlation (click ⋈
 *    recent purchase). The time-range predicate + both-side watermarks
 *    are what let Spark evict join state; an unbounded-condition
 *    stream-stream join cannot discard anything and is a scale bug, so
 *    the operator makes the bound a required argument.
 */
object StreamJoins {

  /**
   * Exactly-once view of an at-least-once stream: drop records whose
   * `idCols` were already seen, keeping dedup state only `watermark`
   * past the event-time column `tsCol` (state-store size ∝ keys per
   * watermark window, not total keys).
   */
  def dedupWithinWatermark(stream: DataFrame, idCols: Seq[String],
      tsCol: String = "event_ts", watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /**
   * Inner event-time interval join: each left row matches right rows
   * with equal `keys` whose `rightTs` falls in
   * `[leftTs - maxDelay, leftTs]`. Both sides are watermarked so the
   * join state for rows older than watermark + maxDelay is evicted.
   * `leftTs`/`rightTs` must be distinct names (rename before calling —
   * the result keeps both).
   */
  def intervalJoin(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, keys: Seq[String],
      maxDelay: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    require(leftTs != rightTs, "leftTs and rightTs must be distinct column names")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    // side-anchored like keyCond: unanchored col() resolves ambiguously
    // when both inputs carry both timestamp names (two projections of
    // one wide demuxed schema — a common shape)
    val rangeCond = r(rightTs) >= l(leftTs) - expr(s"INTERVAL $maxDelay") &&
      r(rightTs) <= l(leftTs)
    keys.foldLeft(l.join(r, keyCond && rangeCond))((df, k) => df.drop(r(k)))
  }
}
