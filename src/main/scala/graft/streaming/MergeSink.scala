package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Merge

/**
 * Streaming MERGE sink: maintain a queryable TABLE (not an append log)
 * from a CDC change stream, via `foreachBatch` + [[Merge.mergeBatch]] —
 * the standard "upsert into a snapshot" sink pattern for stores without
 * transactional merge. Each micro-batch:
 *
 *  1. compacts intra-batch multi-versions to one change per key
 *     ([[CdcMaterializer.latestSnapshot]]'s max_by shape, delete-aware);
 *  2. merges them into the current snapshot in one full-outer pass;
 *  3. atomically swaps the snapshot directory (write to `.next`, rename
 *     over — readers see the old or the new snapshot, never a partial).
 *
 * vs [[CdcUpsertStream.latestByKey]]: that operator keeps latest-by-key
 * INSIDE the state store and emits a changelog; this one materializes
 * the full table each batch. State-store upsert wins at high change
 * rates; snapshot-merge wins when batches are small relative to the
 * table and downstream wants plain parquet. At 100 TB the swap step
 * becomes partition-scoped (merge only partitions containing changed
 * keys — see `Merge` scaladoc); whole-snapshot swap is the local form.
 *
 * Exactly-once: foreachBatch re-delivers a batch after failure; the
 * merge is idempotent for U/D (same change twice = same snapshot), and
 * the rename-swap makes the re-run overwrite, not double-apply.
 */
object MergeSink {

  /**
   * @param changes streaming DataFrame carrying `key` + `opCol` +
   *                the snapshot's data columns
   * @param snapshotDir parquet directory holding the maintained table
   * @param seqCol intra-batch version order (latest wins per key)
   */
  def mergeInto(changes: DataFrame, snapshotDir: String, key: String,
      opCol: String, seqCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = changes.sparkSession
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, snapshotDir, key, opCol, seqCol)
      }
      .start()
  }

  /** One batch application (factored out for direct batch use/tests). */
  def applyBatch(spark: SparkSession, batch: DataFrame, snapshotDir: String,
      key: String, opCol: String, seqCol: String): Unit = {
    if (batch.isEmpty) return
    // 1. intra-batch compaction: latest (by seq) change per key survives
    val dataCols = batch.columns.toSeq.filterNot(c => c == key || c == seqCol)
    val compacted = batch
      .groupBy(col(key))
      .agg(max_by(struct(dataCols.map(col): _*), col(seqCol)).as("__p"))
      .select(col(key) +: dataCols.map(c => col(s"__p.$c").as(c)): _*)
    // 2. merge with the existing snapshot (empty on first batch)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val cur = new org.apache.hadoop.fs.Path(snapshotDir)
    val target =
      if (fs.exists(cur)) spark.read.parquet(snapshotDir)
      else compacted.filter(lit(false)).drop(opCol) // empty, right schema
    val merged = Merge.mergeBatch(target, compacted, key, opCol)
    // 3. write-then-swap: readers never observe a partial snapshot
    val next = new org.apache.hadoop.fs.Path(snapshotDir + ".next")
    merged.write.mode("overwrite").parquet(next.toString)
    if (fs.exists(cur)) fs.delete(cur, true)
    fs.rename(next, cur)
  }
}
