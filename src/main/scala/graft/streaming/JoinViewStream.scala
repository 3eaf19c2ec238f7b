package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.JoinView

/**
 * Streaming maintenance of an incremental join view
 * ([[graft.operators.JoinView]]): a continuous feed of fact rows folds
 * into the standing enriched snapshot micro-batch by micro-batch,
 * each batch enriched against the dim AS OF that batch (the dim
 * DataFrame is re-evaluated per micro-batch, so a catalog-backed dim
 * picks up updates between batches). Dim DELTAS remain a batch-side
 * concern ([[graft.operators.JoinView.foldDim]]) — they re-enrich
 * history, which is not a per-micro-batch cost anyone should pay.
 *
 * Re-delivery safety needs no commit tags (unlike [[RollupStream]]):
 * a fact fold is an UPSERT by fact key, so a crashed and re-delivered
 * micro-batch rewrites identical rows — invisible to readers by
 * construction (JoinViewSpec pins this).
 */
object JoinViewStream {

  /** Continuous fact-side maintenance. First batch initializes the
    * store. `dim` is BY-NAME: it is re-constructed per micro-batch,
    * so a `spark.read.parquet(...)`/catalog-table dim re-lists its
    * files each batch and updates land without restarting the stream
    * (a pre-built DataFrame would pin the file listing of the stream's
    * first batch — or fail outright when an overwrite replaces it). */
  def maintain(factRows: DataFrame, storeDir: String, dim: => DataFrame,
      spec: JoinView.Spec, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = factRows.sparkSession
    factRows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          JoinView.foldFacts(spark, storeDir, batch, dim, spec)
      }
      .start()
  }
}
