package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC snapshot materialization: collapse an append-only change log
 * (insert/update/delete per key) to the latest surviving row per key.
 *
 * The reference pipeline appends change records with their `operation`
 * and leaves materialization to the query layer (SURVEY §7.3 item 3);
 * this operator IS that query layer piece.
 *
 * Plan shape: ONE aggregation — `max_by(payload-struct, order-struct)`
 * per key — WITH map-side partial aggregation (struct buffers plan as
 * SortAggregate, so each side sorts by grouping key; the sorts are
 * partition-local and spillable). The load-bearing property is the
 * partial combine: a hot key (millions of changes to one row)
 * collapses to ONE candidate per map partition BEFORE the shuffle, so
 * shuffle volume is distinct-keys-per-partition and skew never
 * concentrates. Contrast the row_number-window form: the full change
 * history shuffles (no partial reduction) and a hot key's entire
 * history lands in one task.
 */
object CdcMaterializer {

  /**
   * @param log       change log
   * @param keyCols   primary-key columns
   * @param orderCols ordering (latest wins = max tuple, compared
   *                  field-by-field; include a unique tiebreak)
   * @param opCol     operation column; keys whose latest value is
   *                  `deleteOp` are dropped from the snapshot
   */
  def latestSnapshot(log: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    val payload = log.columns.filterNot(keyCols.contains)
    val latest = log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), struct(orderCols: _*))
        .as("__latest"))
      .select(keyCols.map(col) ++
        payload.map(c => col(s"__latest.`$c`").as(c)): _*)
    // null-safe: a latest row with a NULL op is DATA whose operation
    // was never stamped, not a delete — a bare =!= would null-propagate
    // and silently drop the key from the snapshot as if deleted
    latest.filter(col(opCol).isNull || col(opCol) =!= deleteOp)
  }

  /**
   * SCD Type-2 history: every change event opens a version interval
   * `[valid_from, valid_to)`; the NEXT change to the same key (any op,
   * including a delete) closes it. Delete events close the prior
   * version but are not themselves emitted, so a key whose last op is
   * a delete has no `is_current` row.
   *
   * Plan shape: one window (`lead` over key, ordered by time+tiebreak)
   * = ONE shuffle on the key. Unlike [[latestSnapshot]] there is no
   * partial reduction to exploit — the output is the same cardinality
   * as the input (every version survives), so the window IS the
   * minimal shape. At 100 TB the shuffle is sized by history volume,
   * not key count; a hot key concentrates its history in one task,
   * which is inherent to emitting its chained intervals (the sort
   * within the task is spillable).
   *
   * @param log     change log (append-only)
   * @param keyCols primary-key columns
   * @param tsCol   event-time column — becomes `valid_from`
   * @param tieCols unique tiebreak for same-timestamp changes
   * @param opCol   operation column; `deleteOp` rows close but don't emit
   */
  def scd2History(log: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col(_).asc): _*)
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
