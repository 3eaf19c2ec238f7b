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
 * owns intra-batch ordering; this one owns application). One sanctioned
 * exception, used by [[mergePartitioned]]: a D+I pair for the same key
 * (a partition move). The full-outer join fans the key to both change
 * rows; the D row filters out, the I row carries the values — exactly
 * one surviving copy.
 *
 * Scale shape: one shuffle of each side on the key (or a broadcast of
 * the change set when AQE sizes it small — the common case: changes ≪
 * snapshot). The full payload travels once; no window, no second pass.
 * At 100 TB with a partitioned snapshot, compose with
 * [[StreamSplitter.replayAll]]-style dynamic partition overwrite so
 * only partitions containing changed keys rewrite.
 */
object Merge {

  /** The op domain is CLOSED: 'I'/'U'/'D', non-null, case-sensitive.
    * Anything else raises at execution on the offending row — the CDC
    * failure modes this kills are a lowercase 'd' silently acting as
    * an upsert (deletes never applied, dead rows forever) and a NULL
    * op masquerading as "no change arrived for this key" (which the
    * full-outer join cannot distinguish from a target-only row). */
  private def validatedOps(changes: DataFrame, opCol: String): DataFrame = {
    require(changes.columns.contains(opCol),
      s"changes must carry an '$opCol' column")
    changes.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"invalid '$opCol' (want I/U/D): "),
          coalesce(col(opCol).cast("string"), lit("NULL"))))))
  }

  def mergeBatch(target: DataFrame, changes0: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(_ == key)
    val changes = validatedOps(changes0, opCol)
    target.as("t").join(changes.as("c"), Seq(key), "full_outer")
      // keep unless an explicit D arrived; a target-only row has NULL op
      // (NULL <> 'D' is NULL, hence the coalesce)
      .filter(coalesce(col(s"c.$opCol") =!= "D", lit(true)))
      .select(col(key) +: dataCols.map(cn =>
        when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"t.$cn")).as(cn)): _*)
  }

  /**
   * [[mergeBatch]] with SCHEMA EVOLUTION (Delta's autoMerge
   * discipline): the change set may carry columns the snapshot has
   * never seen, and may omit snapshot columns it does not update.
   * The result schema is target ∪ changes, target order first:
   *
   *  - a column in BOTH: change rows take the change value, untouched
   *    rows keep the target value (plain [[mergeBatch]] semantics);
   *  - a TARGET-ONLY column: updates keep the target value (an
   *    omitted column is "not updated", never nulled — losing data on
   *    a narrower producer is the failure mode this guards), inserts
   *    get NULL;
   *  - a CHANGES-ONLY column: change rows carry their value, all
   *    pre-existing rows get NULL — the backfill-free evolution every
   *    long-lived 100 TB snapshot needs, since rewriting history to
   *    add a column is exactly the full-table IO this family exists
   *    to avoid.
   *
   * Evolution is ADD-only by design: a column can stop being written,
   * but never drops from the snapshot schema — readers relying on it
   * keep resolving it (as NULL going forward).
   */
  def mergeBatchEvolve(target: DataFrame, changes0: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val changes = validatedOps(changes0, opCol)
    val tCols = target.columns.toSeq.filterNot(_ == key)
    val cData = changes.columns.toSeq
      .filterNot(c => c == key || c == opCol)
    val newCols = cData.filterNot(tCols.contains)
    target.as("t").join(changes.as("c"), Seq(key), "full_outer")
      .filter(coalesce(col(s"c.$opCol") =!= "D", lit(true)))
      .select(col(key) +: (tCols.map { cn =>
        if (cData.contains(cn))
          when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
            .otherwise(col(s"t.$cn")).as(cn)
        else col(s"t.$cn").as(cn) // not carried: keep, never null out
      } ++ newCols.map(cn =>
        when(col(s"c.$opCol").isNotNull, col(s"c.$cn")).as(cn))): _*)
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
   * Contract (relaxing [[mergeBatch]]'s one-change-per-key to
   * one-change-per-(key, partition)):
   *  - `partCol` is stable per key (the usual date/lang/tenant layout
   *    column). A partition-moving update must be sent as D (old
   *    partition) + I (new partition) — the same contract Hive's dynamic
   *    partition overwrite imposes. The pair MAY arrive in one batch:
   *    the full-outer join fans the key to both change rows, the D row
   *    erases (or no-ops) and the I row carries the values — one
   *    surviving copy, in the new partition. What is rejected loudly is
   *    MORE THAN ONE non-D row per key (two surviving copies in two
   *    partitions would be a silent duplicate).
   *  - every change row — D included — carries a non-null `partCol`
   *    (a D must say which partition its key lives in; that is what
   *    makes pruning sound).
   *
   * Commit protocol — two modes:
   *  - rename (default): park the live leaf dir under a dot-prefixed
   *    (hidden, so partition discovery never sees it) sibling, promote
   *    the staged dir, drop the parked one. Each step is one rename —
   *    atomic on HDFS/local. A crash mid-swap leaves a parked dir with
   *    no live dir; the recovery preamble of the NEXT application
   *    restores it, and the re-delivered batch re-applies idempotently
   *    (I/U collapse to upsert; D of an absent key is a no-op).
   *  - manifest (`manifestCommit = true`, or auto-detected from an
   *    existing manifest snapshot): the object-store-safe protocol —
   *    no renames anywhere. Touched partitions write ONCE into
   *    immutable generation dirs at their final paths
   *    (`data/<leaf>/g-<v>`), then one small commit file flips the
   *    snapshot ([[ManifestCommit]]). Read such snapshots through
   *    [[readSnapshot]].
   *
   * Either way the snapshot read is PRUNED at the listing level: only
   * the touched leaf directories are handed to the reader (basePath +
   * explicit paths), so untouched partitions' directories are neither
   * listed nor read. (In rename mode the root's immediate children are
   * listed once for the flat-layout guard — one metadata page, not the
   * per-partition recursive discovery a whole-table read would do.)
   */
  def mergePartitioned(spark: SparkSession, snapshotDir: String,
      changes0: DataFrame, key: String, partCol: String,
      opCol: String = "op", manifestCommit: Boolean = false): Seq[String] = {
    // this function runs 3+ actions over the change set (touched
    // collect, duplicate guard, the merge write) — cache it for the
    // duration unless the caller already did (MergeSink persists its
    // compacted batch; a direct caller with expensive lineage should
    // not pay it three times)
    val cachedHere =
      changes0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val changes = if (cachedHere)
      changes0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else changes0
    try mergePartitionedCached(spark, snapshotDir, changes, key, partCol,
      opCol, manifestCommit)
    finally if (cachedHere) { changes.unpersist(); () }
  }

  private def mergePartitionedCached(spark: SparkSession,
      snapshotDir: String, changes: DataFrame, key: String, partCol: String,
      opCol: String, manifestCommit: Boolean): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(conf)
    def leafName(v: String): String =
      ExternalCatalogUtils.escapePathName(partCol) + "=" +
        ExternalCatalogUtils.escapePathName(v)
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
    // at most one SURVIVING copy per key: a D+I pair (partition move) is
    // fine, but two non-D rows would merge into two partitions at once
    val multiNonD = changes.filter(col(opCol) =!= "D")
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(multiNonD.isEmpty,
      s"changes carry multiple non-D rows for one '$key' — a partition " +
        "move must be sent as D(old partition) + I(new partition)")
    val dataSchema = changes.drop(opCol)
    if (manifestCommit || ManifestCommit.exists(fs, dir))
      mergeManifest(spark, dir, fs, changes, key, partCol, opCol,
        dataSchema, touched, leafName)
    else
      mergeRenames(spark, dir, fs, changes, key, partCol, opCol,
        dataSchema, touched, leafName)
  }

  /** Partition-scoped merges are schema-RIGID: the change set must
    * carry exactly the snapshot's columns. Narrower would silently
    * destroy the omitted columns in every rewritten partition (the
    * target read takes the change schema); wider would leave
    * per-partition schema skew that a default (mergeSchema=false)
    * snapshot read resolves from one arbitrary file. ADD columns with
    * a whole-snapshot [[mergeBatchEvolve]] rewrite first. */
  private def requireRigidColumns(changeCols: Seq[String],
      snapCols: Seq[String], dir: Path): Unit = {
    val missing = snapCols.toSet -- changeCols.toSet
    val extra = changeCols.toSet -- snapCols.toSet
    require(missing.isEmpty,
      s"changes omit snapshot columns ${missing.mkString(", ")} at $dir " +
        "— a partition-scoped merge would silently drop them from every " +
        "rewritten partition; send full-width changes")
    require(extra.isEmpty,
      s"changes carry columns ${extra.mkString(", ")} the snapshot at " +
        s"$dir lacks — partition-scoped merges cannot evolve schema; " +
        "run a whole-snapshot mergeBatchEvolve rewrite first")
  }

  /** Rename-swap commit (HDFS/local — atomic dir renames). */
  private def mergeRenames(spark: SparkSession, dir: Path,
      fs: org.apache.hadoop.fs.FileSystem, changes: DataFrame, key: String,
      partCol: String, opCol: String, dataSchema: DataFrame,
      touched: Seq[String], leafName: String => String): Seq[String] = {
    // OCC is a MANIFEST-commit capability (the rebase needs immutable
    // generations + an atomic pointer flip to reason about winners);
    // the park/promote rename swap has neither, so a user who set the
    // conf expecting concurrent writers here must hear that it does
    // not apply rather than discover it in interleaved renames
    if (ManifestCommit.occEnabled(spark))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"spark.graft.merge.occ is set but snapshot $dir uses the " +
          "rename-swap layout — optimistic concurrency applies to " +
          "manifest-commit snapshots only; this merge remains " +
          "single-writer (rebuild with manifestCommit = true to get OCC)")
    def renameOrDie(a: Path, b: Path): Unit =
      require(fs.rename(a, b), s"rename $a -> $b failed")
    def parkedName(v: String): String = ".merge_old_" + leafName(v)
    // recovery: restore any partition parked by a crashed previous swap
    recoverParkedPartitions(spark, dir.toString)
    val children = if (fs.exists(dir)) fs.listStatus(dir).toSeq else Seq.empty
    val visible = children.filterNot(st =>
      st.getPath.getName.startsWith(".") || st.getPath.getName.startsWith("_"))
    // a FLAT (unpartitioned) snapshot must fail loudly, not read as
    // "no live partitions": treating its files as absent would merge
    // against empty and the swap would bury the existing data — the
    // silent-loss failure mode. Migrate the layout (one partitioned
    // rewrite) before switching a sink to partitioned mode.
    require(!visible.exists(_.isFile),
      s"snapshot at $dir is not Hive-partitioned on '$partCol' " +
        "(flat data files found) — partition-scoped merge needs a " +
        "partitioned layout; rewrite the snapshot partitioned first")
    // …and it must be partitioned on THIS column: a mismatched partCol
    // would make every touchedLive lookup miss, merge against empty,
    // and write a second partition scheme beside the old one —
    // duplicated keys plus an unreadable mixed layout
    val leafPrefix = ExternalCatalogUtils.escapePathName(partCol) + "="
    visible.filter(_.isDirectory).foreach { st =>
      val n = st.getPath.getName
      require(n.startsWith(leafPrefix),
        s"snapshot at $dir is partitioned on " +
          s"'${n.takeWhile(_ != '=')}', not '$partCol'")
    }
    // pruned scan: ONLY the touched leaf dirs are handed to the reader
    // (basePath keeps the partition column parsed from the path), so no
    // other partition directory is ever listed — at catalog-scale
    // partition counts the listing cost follows the batch, not the table
    val touchedLive = touched.map(v => new Path(dir, leafName(v)))
      .filter(fs.exists)
    val target =
      if (touchedLive.nonEmpty) {
        // the snapshot's OWN schema (never forced to the change set's):
        // schema drift fails the rigid check loudly instead of silently
        // dropping columns in the rewrite
        val t0 = spark.read.option("basePath", dir.toString)
          .parquet(touchedLive.map(_.toString): _*)
        requireRigidColumns(dataSchema.columns.toSeq, t0.columns.toSeq, dir)
        t0.select(dataSchema.columns.map(col): _*)
      } else {
        // all-new partitions: an existing leaf's schema still governs
        visible.find(_.isDirectory).foreach { st =>
          requireRigidColumns(dataSchema.columns.toSeq,
            spark.read.option("basePath", dir.toString)
              .parquet(st.getPath.toString).columns.toSeq, dir)
        }
        dataSchema.filter(lit(false))
      }
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

  /** Manifest commit (object stores — no renames; see [[ManifestCommit]]). */
  private def mergeManifest(spark: SparkSession, dir: Path,
      fs: org.apache.hadoop.fs.FileSystem, changes: DataFrame, key: String,
      partCol: String, opCol: String, dataSchema: DataFrame,
      touched: Seq[String], leafName: String => String): Seq[String] = {
    // preamble GC = the whole recovery story: torn commits and
    // staged-but-uncommitted generations from any crash point clear
    // out (fresh stages survive the grace window — see stagedGrace)
    val retain = ManifestCommit.retention(spark)
    val grace = ManifestCommit.stagedGrace(spark)
    ManifestCommit.gc(fs, dir, retain, grace)
    val st = ManifestCommit.read(fs, dir)
    requireManifestLayout(fs, dir, st)
    require(newestNonEmptyState(fs, dir).forall(_.live.forall(_.contains("/"))),
      s"snapshot at $dir is a whole-snapshot manifest — it cannot be " +
        "partition-scope merged; rebuild it partitioned")
    val data = ManifestCommit.dataDir(dir)
    val liveMap: Map[String, String] = ManifestCommit.liveLeafMap(st)
    // partitioned on THIS column (see the rename-mode twin)
    val leafPrefix = ExternalCatalogUtils.escapePathName(partCol) + "="
    liveMap.keys.foreach { l =>
      require(l.startsWith(leafPrefix),
        s"snapshot at $dir is partitioned on '${l.takeWhile(_ != '=')}', " +
          s"not '$partCol'")
    }
    val touchedLive = touched.flatMap(v => liveMap.get(leafName(v))
      .map(g => new Path(new Path(data, leafName(v)), g)))
    val target =
      if (touchedLive.nonEmpty) {
        // snapshot's OWN schema + the rigid check (see rename twin)
        val t0 = spark.read.option("basePath", data.toString)
          .parquet(touchedLive.map(_.toString): _*)
        requireRigidColumns(dataSchema.columns.toSeq, t0.columns.toSeq, dir)
        t0.select(dataSchema.columns.map(col): _*)
      } else {
        liveMap.headOption.foreach { case (leaf, gen) =>
          requireRigidColumns(dataSchema.columns.toSeq,
            spark.read.option("basePath", data.toString)
              .parquet(new Path(new Path(data, leaf), gen).toString)
              .columns.toSeq, dir)
        }
        dataSchema.filter(lit(false))
      }
    val merged = mergeBatch(target, changes, key, opCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newVer = st.map(_.version + 1).getOrElse(1L)
      val occ = ManifestCommit.occEnabled(spark)
      // multi-writer guard 1 (see commitWholeGeneration): post-GC, a
      // touched partition can only hold a generation dir for this
      // version if a concurrent writer is staging/committed it. Under
      // OCC concurrent staging is EXPECTED (nonce paths keep writers
      // collision-free; the flip loop below serializes them), so the
      // probe would only abort innocent disjoint peers — skipped.
      if (!occ)
        touched.map(v => new Path(data, leafName(v)))
          .find(ManifestCommit.versionDirExists(fs, _, newVer)).foreach { p =>
            throw new IllegalArgumentException(
              s"a generation for version $newVer already exists under $p — " +
                "a concurrent writer is active (snapshots are " +
                "single-writer); stop the second stream and run Merge.fsck " +
                "before trusting the snapshot")
          }
      // one writer-unique generation name for the whole commit — every
      // touched leaf stages under it, the commit records it per leaf
      val gen = ManifestCommit.stagedGenName(newVer)
      // partitions whose merged content is empty (every row deleted)
      // drop out of the manifest instead of staging an empty dir
      val counts = merged.groupBy(col(partCol).cast("string").as("__p"))
        .count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nonEmpty = touched.filter(v => counts.getOrElse(v, 0L) > 0L)
      // each touched partition writes ONCE into its final immutable,
      // WRITER-UNIQUE home (leaf/g-<v>-<nonce>) — no staging dir, no
      // rename, and no path a racing writer may own (see
      // commitWholeGeneration). One small job per touched partition
      // (they run concurrently, bounded); the per-job overhead is the
      // price of never asking the store for a directory rename. Each
      // job filters the PERSISTED merged set — cached-batch min/max
      // pruning keeps that cheap when partCol clusters the cache; at
      // very large touched-partition counts (hundreds+) prefer
      // splitting the batch into fewer-partition chunks upstream.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, nonEmpty.size)))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try
        scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(nonEmpty) { v =>
            scala.concurrent.Future {
              merged.filter(col(partCol).cast("string") === v).drop(partCol)
                .write.mode("overwrite")
                .parquet(new Path(new Path(data, leafName(v)), gen).toString)
            }
          }, scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      val ourLeaves = touched.map(leafName).toSet
      // the staged files as written — re-checked below (requireIntact)
      // so a peer's GC reclaiming a stage mid-commit fails THIS writer
      // loudly instead of publishing generations with missing files
      val stagedPaths = nonEmpty.map(v => new Path(new Path(data, leafName(v)), gen))
      val stagedListings = stagedPaths.map(p =>
        p -> ManifestCommit.dataFileListing(fs, p))
      // multi-writer guards 2+3: expected-version compare, then the
      // commit file's exclusive create (see commitWholeGeneration).
      // Under OCC, losing either guard to a DISJOINT winner rebases:
      // re-read the winner's state, verify no commit since `st`
      // repointed one of OUR leaves (generations are immutable, so an
      // unchanged mapping means our staged merge is still derived
      // from current data), carry the winners' entries forward, and
      // re-flip at the next version. Overlap aborts loudly — the
      // merge was computed from superseded partition state.
      var base = st
      var attempt = 0
      var flipped = false
      while (!flipped) {
        val ver = base.map(_.version + 1).getOrElse(1L)
        val newLive = (ManifestCommit.liveLeafMap(base) -- ourLeaves) ++
          nonEmpty.map(v => leafName(v) -> gen)
        try {
          ManifestCommit.requireUnchanged(fs, dir, base)
          stagedListings.foreach { case (p, l) =>
            ManifestCommit.requireIntact(fs, dir, p, l) }
          // the flip: one small commit object names the live generations
          ManifestCommit.write(fs, dir,
            ManifestCommit.State(ver,
              newLive.toSeq.sorted.map { case (l, g) => s"$l/$g" }))
          flipped = true
        } catch {
          case e: ManifestCommit.CommitConflictException if occ &&
              e.peerMidFlip &&
              attempt >= ManifestCommit.occRetries(spark) =>
            // budget exhausted while a peer was mid-flip: one final
            // read decides the DIAGNOSIS. A peer that completed its
            // flip exactly as our budget ran out leaves the version
            // moved — the store is healthy, just contended, and the
            // torn-conflict guidance (grace windows, fsck) would send
            // the operator chasing a corruption that never happened.
            // An unmoved version means the peer really crashed
            // mid-flip — the torn guidance stands.
            val cur = ManifestCommit.read(fs, dir)
            if (cur.map(_.version).getOrElse(0L) >
                base.map(_.version).getOrElse(0L))
              throw new IllegalStateException(
                s"optimistic merge at $dir lost the flip race " +
                  s"$attempt times and the retry budget " +
                  "(spark.graft.merge.occRetries) is exhausted — the " +
                  "snapshot is HEALTHY (a peer's commit landed) but " +
                  "contended; replay this batch, and raise the retry " +
                  "budget if contention is routine", e)
            else throw e
          case e: IllegalStateException if occ &&
              attempt < ManifestCommit.occRetries(spark) =>
            attempt += 1
            val cur = ManifestCommit.read(fs, dir)
            if (cur.map(_.version).getOrElse(0L) <=
                base.map(_.version).getOrElse(0L)) e match {
              case c: ManifestCommit.CommitConflictException
                  if c.peerMidFlip =>
                // the exclusive create lost to a peer MID-FLIP: its
                // commit file exists but its content hasn't landed, so
                // read() still resolves the old version. Wait a beat
                // for the flip to become readable, then loop — the
                // next requireUnchanged sees the moved version and the
                // ordinary rebase takes over. A peer that CRASHED
                // mid-flip never completes; the retry budget runs out
                // and the torn-conflict error (with its grace-window
                // guidance) surfaces loudly.
                Thread.sleep(math.min(1000L, 50L * attempt))
              case _ =>
                // any other cause with no newer winner (our stage
                // reclaimed, live state torn) keeps the loud path
                throw e
            } else {
              val winnersTouched = ManifestCommit.changedLeaves(
                ManifestCommit.liveLeafMap(st),
                ManifestCommit.liveLeafMap(cur))
              val overlap = winnersTouched.intersect(ourLeaves)
              if (overlap.nonEmpty)
                throw new IllegalStateException(
                  s"optimistic merge at $dir lost to a concurrent commit " +
                    s"that touched the SAME partition(s) " +
                    s"${overlap.toSeq.sorted.mkString(", ")} — this batch's " +
                    "merge was derived from superseded partition state and " +
                    "cannot rebase; replay it against the new live state " +
                    "(run Merge.fsck first)", e)
              base = cur
            }
        }
      }
      // post-commit cleanup of generations older than the retention
      // window (best-effort — a crash here is repaired by the next
      // preamble GC)
      ManifestCommit.gc(fs, dir, retain, grace)
    } finally merged.unpersist()
    touched
  }

  /** Read a [[mergePartitioned]]/[[graft.streaming.MergeSink]] snapshot,
    * resolving through the manifest when one exists (manifest-committed
    * snapshots MUST be read this way — a raw directory read would see
    * every generation). Falls through to a plain parquet read for
    * rename-layout snapshots, so callers can use it unconditionally. */
  def readSnapshot(spark: SparkSession, snapshotDir: String): DataFrame = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    ManifestCommit.read(fs, dir) match {
      case Some(st) => resolveState(spark, dir, st)
      case None     => spark.read.parquet(snapshotDir)
    }
  }

  private def resolveState(spark: SparkSession, dir: Path,
      st: ManifestCommit.State): DataFrame = {
    val data = ManifestCommit.dataDir(dir)
    if (st.live.isEmpty) {
      // drained snapshot (a batch deleted every remaining row): keep
      // the SCHEMA by resolving an empty read through the newest
      // retained commit that still lists generations — downstream
      // .select / typed .as keep working, matching what the rename
      // path and the empty-target branch preserve. Only when no
      // predecessor survives retention is there genuinely no schema
      // anywhere on disk.
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      return newestNonEmptyState(fs, dir) match {
        case Some(prior) => resolveState(spark, dir, prior).filter(lit(false))
        case None        => spark.emptyDataFrame
      }
    }
    if (st.live.forall(_.contains("/")))
      spark.read.option("basePath", data.toString)
        .parquet(st.live.map(e => new Path(data, e).toString): _*)
    else spark.read.parquet(new Path(data, st.live.head).toString)
  }

  /** Newest retained commit that actually lists generations. Drained
    * commits (empty live set) say nothing about a snapshot's layout
    * mode or schema; this is what the whole-vs-partitioned guards and
    * the drained-read fallback consult, so a drain cannot vacuously
    * pass both mode guards and silently flip the layout. */
  private[operators] def newestNonEmptyState(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[ManifestCommit.State] =
    ManifestCommit.versions(fs, dir).reverseIterator
      .flatMap(v => ManifestCommit.readVersion(fs, dir, v))
      .find(_.live.nonEmpty)

  /** Refuse to bolt a manifest onto a rename-layout snapshot: the
    * manifest read would resolve to nothing and the existing leaf dirs
    * would be silently shadowed — migrate with one rewrite first. */
  private[graft] def requireManifestLayout(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      st: Option[ManifestCommit.State]): Unit =
    if (st.isEmpty && fs.exists(dir)) {
      val stray = fs.listStatus(dir).filterNot { s =>
        val n = s.getPath.getName
        n == "data" || n.startsWith(".") || n.startsWith("_")
      }
      require(stray.isEmpty,
        s"snapshot at $dir holds non-manifest content — migrate the " +
          "rename-layout snapshot before enabling manifest commits")
    }

  /** Whole-snapshot manifest merge — the object-store-safe analog of
    * the park/promote whole-snapshot swap, shared with
    * [[graft.streaming.MergeSink]] so the gc → read → layout-guard →
    * generation-write → commit → gc protocol lives in ONE place: write
    * the merged snapshot once into an immutable generation dir at its
    * final path, then flip the commit pointer ([[ManifestCommit]]). */
  def mergeWholeManifest(spark: SparkSession, snapshotDir: String,
      changes0: DataFrame, key: String,
      opCol: String = "op"): Unit = {
    // NO ControlPlane scope here, deliberately (r17 A/B): unlike the
    // id-set mutation paths, the merge's full-outer join and the
    // generation write ARE the data plane of this store family — AQE's
    // runtime coalescing sizes the written generation's files from the
    // actual merged bytes, and turning it off measurably inflated the
    // file count and the write (q123: jobs 41→20 but wall +40% and
    // +3 MB written). The change set is evaluated once, by the
    // generation write — no separate guard action; cache it only for
    // callers that were already sharing it (the old guard+merge
    // double-evaluation is gone, r17).
    val cachedHere =
      changes0.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val changes = if (cachedHere)
      changes0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else changes0
    val guardMsg =
      s"changes carry multiple non-D rows for one '$key' — compact the " +
        "batch to at most one surviving change per key " +
        "(CdcMaterializer.latestSnapshot) before merging"
    try {
      // at most one SURVIVING copy per key (mergeBatch's documented
      // contract, enforced where a store commit makes the corruption
      // durable): two non-D rows for one key would fan the full-outer
      // join out into a duplicate-keyed snapshot — the silent failure
      // mode of a dim delta delivered twice or an uncompacted CDC
      // tail. A D+I pair stays legal (delete-then-reinsert collapses
      // to one surviving row). The guard RIDES THE GENERATION WRITE
      // (r17): a per-key non-D count windowed over the change side —
      // co-partitioned with the merge join, so no extra exchange —
      // raises from the write job on the first violation, replacing
      // the separate pre-commit guard action that cost one driver
      // round-trip per commit (guide §1.2). The pointer flips only
      // after a fully successful write, so a refused batch leaves the
      // store untouched exactly as before; the partial staged
      // generation is ordinary debris the next preamble GC clears.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
      val guarded = changes
        .withColumn("__nnd",
          sum(when(col(opCol) =!= "D", 1L).otherwise(0L)).over(w))
        .withColumn(opCol, when(col("__nnd") > 1,
          raise_error(lit(guardMsg))).otherwise(col(opCol)))
        .drop("__nnd")
      var pinnedTombs: Array[org.apache.hadoop.fs.Path] = Array.empty
      var stagedGen: String = null
      try commitWholeGeneration(spark, snapshotDir) { (genPath, st) =>
        stagedGen = genPath
        val data = ManifestCommit.dataDir(new Path(snapshotDir))
        val target0 = st.filter(_.live.nonEmpty)
          .map(s => spark.read.parquet(new Path(data, s.live.head).toString))
          .getOrElse(changes.filter(lit(false)).drop(opCol))
        // fold APPLICABLE deletion-vector tombstones into the
        // generation being written (the subtraction rides a rewrite
        // that was happening anyway): this is what lets a change row
        // re-assert a previously deleted key — the merge wins over the
        // tombstone, instead of the key staying silently hidden and
        // then being destroyed by the next compact
        val (target, pinned) =
          DeletionVectors.foldInto(spark, snapshotDir, target0)
        pinnedTombs = pinned
        mergeBatch(target, guarded, key, opCol)
          .write.mode("overwrite").parquet(genPath)
      } catch {
        // surface the riding guard as the same pre-commit refusal it
        // always was (spec-pinned type + message), unwrapped from the
        // write job's failure chain — and remove OUR partial staged
        // generation first: a deterministic refusal is not a crash,
        // and leaving the dir would trip the next commit's concurrent-
        // writer guard until the staging grace expires (best-effort;
        // if the delete itself fails, the store is in exactly the
        // state a died writer leaves and heals the same way)
        case e: Throwable if guardTripped(e) =>
          if (stagedGen != null) {
            val fs = new Path(snapshotDir)
              .getFileSystem(spark.sessionState.newHadoopConf())
            try { fs.delete(new Path(stagedGen), true); () }
            catch { case _: Throwable => () }
          }
          throw new IllegalArgumentException(
            s"requirement failed: $guardMsg")
      }
      // post-flip: the folded sidecar files are inert (version rule) —
      // best-effort removal; a crash here is healed by the next fold
      DeletionVectors.clearPinned(spark, snapshotDir, pinnedTombs)
    } finally if (cachedHere) { changes.unpersist(); () }
  }

  /** Does this failure chain carry the riding multi-non-D guard? */
  private def guardTripped(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 20) {
      if (Option(cur.getMessage)
          .exists(_.contains("multiple non-D rows"))) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** The whole-snapshot manifest-commit tail — gc → read → layout
    * guards → generation write → pointer flip → post-commit gc — in
    * ONE place, shared by [[mergeWholeManifest]] and the standing-state
    * stores ([[Rollup]] and everything built on it): a protocol fix
    * lands once, and every store gets the layout guards. `writeGen`
    * receives a writer-unique STAGING path plus the pre-commit state
    * (to read the live generation); the staged dir is promoted to the
    * final generation path only after the expected-version re-check
    * passes, and the pointer flips only after that — a crash or a lost
    * race at any point leaves the old commit live and the next
    * preamble GC clears the staging debris. */
  private[graft] def commitWholeGeneration(spark: SparkSession,
      snapshotDir: String, tag: Option[String] = None)(
      writeGen: (String, Option[ManifestCommit.State]) => Unit): Unit = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val retain = ManifestCommit.retention(spark)
    val grace = ManifestCommit.stagedGrace(spark)
    ManifestCommit.gc(fs, dir, retain, grace)
    val st = ManifestCommit.read(fs, dir)
    requireManifestLayout(fs, dir, st)
    require(newestNonEmptyState(fs, dir).forall(_.live.forall(!_.contains("/"))),
      s"snapshot at $dir is a partition-scoped manifest — pass " +
        "partitionCol to keep merging it partition-scoped")
    val newVer = st.map(_.version + 1).getOrElse(1L)
    // multi-writer guard 1: after the preamble GC, a generation dir for
    // this version can only exist if a concurrent writer is staging or
    // committed it between our GC and now — detect it before any work
    require(!ManifestCommit.versionDirExists(fs,
        ManifestCommit.dataDir(dir), newVer),
      s"a generation for version $newVer already exists at $dir — a " +
        "concurrent writer is active (snapshots are single-writer); stop " +
        "the second stream and run Merge.fsck before trusting the snapshot")
    // the generation is written ONCE at its final, WRITER-UNIQUE path
    // (g-<v>-<nonce>): this writer's bytes never touch a path another
    // writer — committed or staging — may own, so a racing loser can
    // never clobber the winner's generation; the loser fails below and
    // its unreferenced dir becomes GC debris. No rename anywhere.
    val gen = ManifestCommit.stagedGenName(newVer)
    val genPath = new Path(ManifestCommit.dataDir(dir), gen)
    writeGen(genPath.toString, st)
    // the staged files as written — re-checked below so GC
    // interference from a racing peer fails THIS commit loudly
    // instead of publishing a generation with missing files
    val stagedFiles = ManifestCommit.dataFileListing(fs, genPath)
    // multi-writer guard 2: expected-version compare before the flip;
    // guard 3 is the commit file's own exclusive create
    ManifestCommit.requireUnchanged(fs, dir, st)
    ManifestCommit.requireIntact(fs, dir, genPath, stagedFiles)
    ManifestCommit.write(fs, dir,
      ManifestCommit.State(newVer, Seq(gen), tag))
    // post-commit cleanup beyond retention (best-effort — a crash here
    // is repaired by the next preamble GC)
    ManifestCommit.gc(fs, dir, retain, grace)
  }

  /** Read-only integrity audit of a manifest snapshot (any store that
    * commits through the protocol: MERGE snapshots, rollups, data
    * cards, join views): one `(kind, detail)` row per finding, empty
    * = healthy. See [[ManifestCommit.fsck]] for the finding kinds. */
  def fsck(spark: SparkSession, snapshotDir: String): DataFrame = {
    import spark.implicits._
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    ManifestCommit.fsck(fs, dir).toDF("kind", "detail")
  }

  /** Commit versions of a manifest snapshot still readable through
    * [[readSnapshotAt]], ascending — the retention window
    * (`spark.graft.merge.retainCommits`, default 2) bounds how far
    * back this reaches. Empty for rename-layout snapshots. */
  def snapshotVersions(spark: SparkSession, snapshotDir: String): Seq[Long] = {
    val dir = new Path(snapshotDir)
    ManifestCommit.versions(
      dir.getFileSystem(spark.sessionState.newHadoopConf()), dir)
  }

  /** Time travel: read the snapshot as of commit `version` (one of
    * [[snapshotVersions]]). Generations are immutable and retained
    * commits keep theirs, so this is a plain pruned read — no undo
    * replay. Fails loudly when the version is outside the retention
    * window (vacuumed) or was never committed. */
  def readSnapshotAt(spark: SparkSession, snapshotDir: String,
      version: Long): DataFrame = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val st = ManifestCommit.readVersion(fs, dir, version).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot at $snapshotDir has no readable commit $version — " +
          s"available: ${ManifestCommit.versions(fs, dir).mkString(", ")}"))
    resolveState(spark, dir, st)
  }

  /** Trim a manifest snapshot's history to its newest `keepLast`
    * commits, reclaiming generations only they referenced. `keepLast`
    * clamps to 1 — the live commit is never collectable. An explicit
    * maintenance call: merges themselves retain
    * `spark.graft.merge.retainCommits` automatically. */
  def vacuum(spark: SparkSession, snapshotDir: String, keepLast: Int): Unit = {
    val dir = new Path(snapshotDir)
    // the same staged-grace gate as the writers' preamble: vacuum run
    // while a writer is staging must not reclaim the fresh stage
    ManifestCommit.gc(
      dir.getFileSystem(spark.sessionState.newHadoopConf()), dir, keepLast,
      ManifestCommit.stagedGrace(spark))
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
