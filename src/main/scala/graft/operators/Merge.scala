package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/**
 * Batch MERGE: apply a keyed change set (op ∈ I/U/D) onto a snapshot in
 * ONE full-outer-join pass — the `MERGE INTO … WHEN MATCHED THEN
 * UPDATE/DELETE WHEN NOT MATCHED THEN INSERT` statement expressed on
 * plain DataFrames (no transactional table format required):
 *
 *  - change row present, op I/U → the change's values win (matched ⇒
 *    update; unmatched ⇒ insert — I and U collapse, upsert-style);
 *  - change row present, op D → the key disappears (a D for an absent
 *    key is a no-op, like MERGE's unmatched-source DELETE);
 *  - no change row → the snapshot row passes through.
 *
 * Contract: at most one change per key — compact a multi-version CDC
 * tail with [[CdcMaterializer.latestSnapshot]] first (that operator
 * owns intra-batch ordering; this one owns application).
 *
 * Scale shape: one shuffle of each side on the key (or a broadcast of
 * the change set when AQE sizes it small — the common case: changes ≪
 * snapshot). The full payload travels once; no window, no second pass.
 * At 100 TB with a partitioned snapshot, compose with
 * [[StreamSplitter.replayAll]]-style dynamic partition overwrite so
 * only partitions containing changed keys rewrite.
 */
object Merge {

  def mergeBatch(target: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(_ == key)
    require(changes.columns.contains(opCol),
      s"changes must carry an '$opCol' column")
    target.as("t").join(changes.as("c"), Seq(key), "full_outer")
      // keep unless an explicit D arrived; a target-only row has NULL op
      // (NULL <> 'D' is NULL, hence the coalesce)
      .filter(coalesce(col(s"c.$opCol") =!= "D", lit(true)))
      .select(col(key) +: dataCols.map(cn =>
        when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"t.$cn")).as(cn)): _*)
  }

  /**
   * Partition-scoped MERGE onto a Hive-partitioned parquet snapshot:
   * apply a change set touching only SOME partitions without reading or
   * rewriting the rest. This is the 100 TB form the [[mergeBatch]]
   * scaladoc promises: a daily CDC batch with 0.1% changed keys costs a
   * read+write of the touched partitions only — cost ∝ changes' partition
   * footprint, not ∝ table size. Untouched partition directories are
   * never opened: their files stay byte-identical at the same paths
   * (asserted in MergeSinkSpec).
   *
   * Plan shape: one bounded collect of the DISTINCT changed partition
   * values (catalog-scale metadata, like replayAll's partition list), a
   * partition-PRUNED scan of the snapshot (`partCol IN touched` reaches
   * the file index — only touched directories list), one full-outer
   * merge, one staged partitioned write, then per-partition rename swaps.
   *
   * Contract (on top of [[mergeBatch]]'s one-change-per-key):
   *  - `partCol` is stable per key (the usual date/lang/tenant layout
   *    column). A partition-moving update must be sent as D (old
   *    partition) + I (new partition) — the same contract Hive's dynamic
   *    partition overwrite imposes.
   *  - every change row — D included — carries a non-null `partCol`
   *    (a D must say which partition its key lives in; that is what
   *    makes pruning sound).
   *
   * Swap protocol mirrors [[graft.streaming.MergeSink.applyBatch]], but
   * per partition: park the live dir under a dot-prefixed (hidden, so
   * partition discovery never sees it) sibling, promote the staged dir,
   * drop the parked one. A crash mid-swap leaves a parked dir with no
   * live dir; the recovery preamble of the NEXT application restores it,
   * and the re-delivered batch re-applies idempotently (I/U collapse to
   * upsert; D of an absent key is a no-op).
   */
  def mergePartitioned(spark: SparkSession, snapshotDir: String,
      changes: DataFrame, key: String, partCol: String,
      opCol: String = "op"): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(conf)
    def renameOrDie(a: Path, b: Path): Unit =
      require(fs.rename(a, b), s"rename $a -> $b failed")
    def leafName(v: String): String =
      ExternalCatalogUtils.escapePathName(partCol) + "=" +
        ExternalCatalogUtils.escapePathName(v)
    def parkedName(v: String): String = ".merge_old_" + leafName(v)
    // recovery: restore any partition parked by a crashed previous swap
    recoverParkedPartitions(spark, snapshotDir)
    // the changed-partition list: bounded, catalog-scale metadata. One
    // pass also enforces the non-null contract — a null partCol row
    // would otherwise be silently unroutable (its partition unknowable,
    // its data never merged).
    val touchedRaw = changes.select(col(partCol).cast("string"))
      .distinct().collect().map(r => Option(r.getString(0))).toSeq
    require(!touchedRaw.contains(None),
      s"changes carry rows with null '$partCol' — every change (D included) " +
        "must name its partition")
    val touched = touchedRaw.flatten.sorted
    // '' is rejected like null: the dynamic-partition writer folds the
    // empty string into the null partition (__HIVE_DEFAULT_PARTITION__),
    // so the swap would look for 'partCol=' (never staged) and read it
    // as partition-fully-deleted — silently dropping the merged rows.
    require(!touched.contains(""),
      s"changes carry rows with empty-string '$partCol' — '' cannot " +
        "round-trip through a Hive partition path; use a sentinel value")
    require(touched.nonEmpty, "changes carry no partition values")
    val dataSchema = changes.drop(opCol)
    val children = if (fs.exists(dir)) fs.listStatus(dir).toSeq else Seq.empty
    val visible = children.filterNot(st =>
      st.getPath.getName.startsWith(".") || st.getPath.getName.startsWith("_"))
    // a FLAT (unpartitioned) snapshot must fail loudly, not read as
    // "no live partitions": treating its files as absent would merge
    // against empty and the swap would bury the existing data — the
    // silent-loss failure mode. Migrate the layout (one partitioned
    // rewrite) before switching a sink to partitioned mode.
    require(!visible.exists(_.isFile),
      s"snapshot at $snapshotDir is not Hive-partitioned on '$partCol' " +
        "(flat data files found) — partition-scoped merge needs a " +
        "partitioned layout; rewrite the snapshot partitioned first")
    val hasLive = visible.exists(_.isDirectory)
    // pruned scan: only the touched directories are listed/read
    val target =
      if (hasLive)
        spark.read.schema(dataSchema.schema).parquet(snapshotDir)
          .filter(col(partCol).isin(touched: _*))
          .select(dataSchema.columns.map(col): _*)
      else dataSchema.filter(lit(false))
    val merged = mergeBatch(target, changes, key, opCol)
    val stage = new Path(dir.getParent, dir.getName + ".stage")
    fs.delete(stage, true)
    merged.write.mode("overwrite").partitionBy(partCol).parquet(stage.toString)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    touched.foreach { v =>
      val live = new Path(dir, leafName(v))
      val parked = new Path(dir, parkedName(v))
      val staged = new Path(stage, leafName(v))
      if (fs.exists(live)) renameOrDie(live, parked)
      // absent staged dir = every row of this partition was deleted
      if (fs.exists(staged)) renameOrDie(staged, live)
      fs.delete(parked, true)
    }
    fs.delete(stage, true)
    touched
  }

  /** Restore partitions parked (`.merge_old_*`) by a crashed
    * [[mergePartitioned]] swap. Called by mergePartitioned's own
    * preamble AND by [[graft.streaming.MergeSink.applyBatch]] before
    * EITHER merge mode runs — a snapshot crashed mid-swap in
    * partitioned mode must be whole again even if the next application
    * is configured unpartitioned (mode is a config change; recovery
    * must not depend on it). */
  private[graft] def recoverParkedPartitions(spark: SparkSession,
      snapshotDir: String): Unit = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".merge_old_")) {
        val live = new Path(dir, n.stripPrefix(".merge_old_"))
        if (!fs.exists(live))
          require(fs.rename(st.getPath, live),
            s"recovery rename ${st.getPath} -> $live failed")
        else fs.delete(st.getPath, true) // stale park: crash after promote
      }
    }
  }
}
