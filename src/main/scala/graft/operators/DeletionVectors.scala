package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Merge-on-read deletes for manifest snapshots (the Delta/Iceberg
 * deletion-vector discipline, expressed at key granularity): a delete
 * writes ONLY the deleted keys into a tombstone sidecar — zero data
 * files are read or rewritten — and reads subtract the tombstones with
 * a broadcast anti-join. Compaction folds the tombstones into a new
 * snapshot generation when their read-time cost warrants the rewrite.
 *
 * Why this matters at 100 TB: a GDPR-style delete of a few thousand
 * keys under copy-on-write costs a rewrite of every touched file
 * (arbitrarily large when keys scatter); under merge-on-read it costs
 * a tombstone-sized write now and one pruned rewrite LATER, amortized
 * across many deletes, scheduled when convenient. The read tax is one
 * broadcast anti-join against a table bounded by the un-compacted
 * delete count — catalog-scale, not data-scale.
 *
 * Crash/idempotency contract:
 *  - [[delete]] is an append of immutable tombstone files; re-running
 *    a delete of already-deleted keys changes nothing a reader sees
 *    (the anti-join is idempotent by construction).
 *  - [[compact]] commits the cleaned generation THROUGH the manifest
 *    pointer first, then clears tombstones. A crash between the two
 *    leaves tombstones that re-subtract already-absent keys — a
 *    no-op — and the next compact clears them. Readers racing a
 *    compact see either (old gen + tombstones) or (new gen +
 *    maybe-stale tombstones): the same final row set either way.
 */
object DeletionVectors {

  private def tombDir(dir: Path) = new Path(dir, "_tombstones")

  /** The sidecar's data files right now (commit markers excluded). A
    * compact clears files individually — the dir may outlive its last
    * tombstone — so emptiness is judged by this list, not existence. */
  private def tombFiles(spark: SparkSession, td: Path): Array[Path] = {
    val fs = td.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(td)) Array.empty
    else fs.listStatus(td).filter(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }).map(_.getPath)
  }

  /** Logical delete: append the keys to the tombstone sidecar. Cost ∝
    * keys; no snapshot data is opened. */
  def delete(spark: SparkSession, snapshotDir: String, keys: DataFrame,
      keyCol: String): Unit =
    keys.select(col(keyCol)).distinct()
      .write.mode("append").parquet(tombDir(new Path(snapshotDir)).toString)

  /** The live view: snapshot minus tombstoned keys. The tombstone side
    * is broadcast (bounded by un-compacted delete volume); the
    * snapshot side streams through the anti-join unshuffled. */
  def read(spark: SparkSession, snapshotDir: String,
      keyCol: String): DataFrame = {
    val snap = Merge.readSnapshot(spark, snapshotDir)
    val files = tombFiles(spark, tombDir(new Path(snapshotDir)))
    if (files.isEmpty) snap
    else snap.join(broadcast(spark.read.parquet(files.map(_.toString): _*)
        .select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
  }

  /** Un-compacted tombstone count — the read-tax gauge a maintenance
    * scheduler polls to decide when [[compact]] pays for itself. */
  def pendingDeletes(spark: SparkSession, snapshotDir: String): Long = {
    val files = tombFiles(spark, tombDir(new Path(snapshotDir)))
    if (files.isEmpty) 0L
    else spark.read.parquet(files.map(_.toString): _*).distinct().count()
  }

  /** Physically apply the tombstones: commit the subtracted snapshot
    * as a new immutable generation (manifest pointer flip — object-
    * store-safe), then clear the sidecar. See the crash contract in
    * the object scaladoc. */
  def compact(spark: SparkSession, snapshotDir: String,
      keyCol: String): Unit = {
    // Pin the sidecar's file list FIRST and operate on exactly that
    // set: a delete() racing this compact appends NEW files, which the
    // snapshot below never reads and the cleanup below never removes —
    // they stay pending for the next compact instead of being dropped
    // unapplied.
    compactPinned(spark, snapshotDir, keyCol,
      tombFiles(spark, tombDir(new Path(snapshotDir))))
  }

  /** The compact body after the file-list pin — separated so the
    * listing↔apply race is testable (DeletionVectorsSpec appends a
    * concurrent delete between the two and asserts it survives). */
  private[operators] def compactPinned(spark: SparkSession,
      snapshotDir: String, keyCol: String,
      pinned: Array[Path]): Unit = {
    val td = tombDir(new Path(snapshotDir))
    val fs = td.getFileSystem(spark.sessionState.newHadoopConf())
    if (pinned.isEmpty) return
    // route through the MERGE protocol as a pure-delete change set so
    // the gc/guard/commit tail stays in one place; null-fill the
    // snapshot's data columns (mergeBatch resolves every target column
    // on the change side — D rows never read them)
    val dels0 = spark.read.parquet(pinned.map(_.toString): _*)
      .select(col(keyCol)).distinct().withColumn("op", lit("D"))
    if (dels0.isEmpty) { pinned.foreach(fs.delete(_, false)); return }
    val dels = Merge.readSnapshot(spark, snapshotDir).schema.fields
      .filterNot(_.name == keyCol)
      .foldLeft(dels0)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    Merge.mergeWholeManifest(spark, snapshotDir, dels, keyCol)
    pinned.foreach(fs.delete(_, false))
  }
}
