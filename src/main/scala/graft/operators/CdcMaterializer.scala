package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    latest.filter(col(opCol) =!= deleteOp)
  }
}
