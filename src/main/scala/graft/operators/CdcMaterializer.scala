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
 * this operator IS that query layer piece: one window over the key
 * ordered by (time desc, tiebreak desc), keep row 1, drop keys whose
 * latest op is a delete.
 *
 * Scale: one shuffle on the key + per-key sort — the standard
 * "latest-by-key" plan. For very hot keys the pre-aggregation variant
 * (max(time) semi-join) applies; row_number is fine for CDC where keys
 * repeat tens of times, not millions.
 */
object CdcMaterializer {

  /**
   * @param log       change log
   * @param keyCols   primary-key columns
   * @param orderCols ordering (latest wins); include a unique tiebreak
   * @param opCol     operation column; rows whose latest value is
   *                  `deleteOp` are dropped from the snapshot
   */
  def latestSnapshot(log: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }
}
