package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Merge

/** Local filesystem that FORBIDS directory renames outside the output
  * committer's `_temporary` staging — the object-store simulation for
  * the manifest-commit tests: on S3 a directory rename is a non-atomic
  * copy, so a commit protocol is object-store-safe only if it never
  * renames. (Committer-internal `_temporary` renames are exempt because
  * a real object-store deployment swaps the committer itself — e.g.
  * the S3A magic committer — which is orthogonal to the snapshot-swap
  * protocol under test.) */
class NoRenameFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: java.net.URI = java.net.URI.create("norename:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (src.toUri.getPath.contains("_temporary") ||
        dst.toUri.getPath.contains("_temporary"))
      super.rename(src, dst)
    else
      throw new java.io.IOException(
        s"rename forbidden by NoRenameFs (object-store simulation): $src -> $dst")
}

/** Simulates an object store having a transient bad moment: while
  * `failCommitOpens` is set, opening a manifest commit file throws —
  * the S3 503/throttle case. Everything else (writes, lists, data
  * reads) stays healthy, which is exactly the window where a
  * swallow-all parse would misread the live commit as torn. */
object FlakyOpenFs { @volatile var failCommitOpens = false }
class FlakyOpenFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "flakyopen"
  override def getUri: java.net.URI = java.net.URI.create("flakyopen:///")
  override def open(f: org.apache.hadoop.fs.Path,
      bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
    if (FlakyOpenFs.failCommitOpens &&
        f.getName.startsWith("_graft_commit"))
      throw new java.io.IOException(
        s"simulated transient store error opening $f")
    else super.open(f, bufferSize)
}

/** The maintained snapshot must equal "apply every change in seq order"
  * after any batch arrival pattern, and re-applying a batch must be a
  * no-op (foreachBatch re-delivery safety). */
class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streaming upsert maintains latest-by-key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double, Long)]
    val changes = mem.toDF().toDF("k", "op", "name", "bal", "seq")
    val dir = tmp("mergesink") + "/snap"
    val q = MergeSink.mergeInto(changes, dir, "k", "op", "seq",
      checkpoint = tmp("mergesink-ckpt"),
      trigger = Trigger.ProcessingTime(0))
    // batch 1: two inserts + an intra-batch update (seq order wins)
    mem.addData((1L, "I", "a", 1.0, 1L), (2L, "I", "b", 2.0, 2L),
      (2L, "U", "b2", 2.5, 3L))
    q.processAllAvailable()
    val s1 = spark.read.parquet(dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(s1 === Seq((1L, "a", 1.0), (2L, "b2", 2.5)))
    // batch 2: delete one key, update the other, insert a third
    mem.addData((1L, "D", "a", 0.0, 4L), (2L, "U", "b3", 3.0, 5L),
      (3L, "I", "c", 9.0, 6L))
    q.processAllAvailable()
    q.stop()
    val s2 = spark.read.parquet(dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(s2 === Seq((2L, "b3", 3.0), (3L, "c", 9.0)))
  }

  test("re-applying the same batch is idempotent (re-delivery safety)") {
    val dir = tmp("mergesink-idem") + "/snap"
    val batch = Seq((1L, "I", "a", 1.0, 1L), (2L, "I", "b", 2.0, 2L))
      .toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, batch, dir, "k", "op", "seq")
    val once = spark.read.parquet(dir).orderBy("k").collect().toSeq
    MergeSink.applyBatch(spark, batch, dir, "k", "op", "seq")
    val twice = spark.read.parquet(dir).orderBy("k").collect().toSeq
    assert(once === twice)
  }

  test("crash between the two swap renames is recovered: parked snapshot restored, batch re-applied") {
    val dir = tmp("mergesink-crash") + "/snap"
    val b1 = Seq((1L, "I", "a", 1.0, 1L), (2L, "I", "b", 2.0, 2L))
      .toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq")
    // simulate dying after `rename(cur, old)` and before `rename(next, cur)`:
    // the live dir is gone, only the parked copy exists
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(cur.getParent, cur.getName + ".old")
    assert(fs.rename(cur, old))
    // restart: the batch is re-delivered; recovery must restore the
    // snapshot first, then the merge applies on top of it
    val b2 = Seq((2L, "U", "b2", 3.0, 3L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq")
    val got = spark.read.parquet(dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "b2", 3.0)))
    assert(!fs.exists(old))
  }

  test("an EMPTY re-delivered batch still runs crash recovery first") {
    val dir = tmp("mergesink-emptyrec") + "/snap"
    val b1 = Seq((1L, "I", "a", 1.0, 1L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(cur.getParent, cur.getName + ".old")
    assert(fs.rename(cur, old)) // crash window: parked, no live dir
    // the next application's first batch carries nothing — "restored
    // at the top of the NEXT application" must hold regardless
    MergeSink.applyBatch(spark, b1.limit(0), dir, "k", "op", "seq")
    assert(fs.exists(cur) && !fs.exists(old))
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("partition-scoped merge is schema-rigid and layout-checked, never silently lossy") {
    val dir = tmp("mergesink-rigid") + "/snap"
    val b1 = Seq((1L, "I", "a", 9.0, "en", 1L), (2L, "I", "b", 8.0, "de", 2L))
      .toDF("k", "op", "name", "bal", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))

    // NARROWER changes (bal omitted): before the rigid check this
    // silently DESTROYED bal in every rewritten partition
    val narrow = Seq((1L, "U", "a2", "en", 3L))
      .toDF("k", "op", "name", "lang", "seq")
    val e1 = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, narrow, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e1.getMessage.contains("omit snapshot columns"), e1.getMessage)
    assert(e1.getMessage.contains("bal"))

    // WIDER changes (new column): would leave per-partition schema skew
    val wide = Seq((1L, "U", "a2", 9.5, "en", "x", 4L))
      .toDF("k", "op", "name", "bal", "lang", "tier", "seq")
    val e2 = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, wide, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e2.getMessage.contains("cannot evolve"), e2.getMessage)

    // WRONG partition column: would merge against empty and write a
    // second partition scheme beside the old one
    val wrongCol = Seq((1L, "U", "a2", 9.5, "en"))
      .toDF("k", "op", "name", "bal", "tenant")
    val e3 = intercept[IllegalArgumentException] {
      Merge.mergePartitioned(spark, dir, wrongCol, "k", "tenant")
    }
    assert(e3.getMessage.contains("not 'tenant'"), e3.getMessage)

    // and the snapshot is untouched by all three rejections
    assert(spark.read.parquet(dir).orderBy("k")
      .select("k", "name", "bal")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 9.0), (2L, "b", 8.0)))
  }

  /** (path, mtime, size) of every data file under a partition dir —
    * byte-identity evidence that the dir was never rewritten. */
  private def fileSig(dir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq.filterNot(_.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.toString, st.getModificationTime, st.getLen))
      .sortBy(_._1)
  }

  test("partition-scoped merge touches only the changed partitions; untouched files byte-identical") {
    val dir = tmp("mergesink-part") + "/snap"
    // first batch through the partitioned path: creates the snapshot
    val b1 = Seq(
      (1L, "I", "a", "en", 1L), (2L, "I", "b", "en", 2L),
      (3L, "I", "c", "de", 3L), (4L, "I", "d", "fr", 4L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))
    val deBefore = fileSig(s"$dir/lang=de")
    val frBefore = fileSig(s"$dir/lang=fr")
    // second batch touches ONLY lang=en: update, delete, insert
    val b2 = Seq(
      (1L, "U", "a2", "en", 5L), (2L, "D", "b", "en", 6L),
      (9L, "I", "z", "en", 7L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val got = spark.read.parquet(dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a2", "en"), (3L, "c", "de"),
      (4L, "d", "fr"), (9L, "z", "en")))
    // de/fr were neither read nor written: same files, same mtimes/sizes
    assert(fileSig(s"$dir/lang=de") === deBefore)
    assert(fileSig(s"$dir/lang=fr") === frBefore)
  }

  test("partition-scoped merge: deleting every row of a partition removes its directory") {
    val dir = tmp("mergesink-partdel") + "/snap"
    val b1 = Seq((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))
    val b2 = Seq((2L, "D", "b", "de", 3L)).toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/lang=de")))
    val got = spark.read.parquet(dir).select("k").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("partition-scoped crash between park and promote is recovered") {
    val dir = tmp("mergesink-partcrash") + "/snap"
    val b1 = Seq((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))
    // simulate dying after parking lang=en and before promoting staged:
    // live dir gone, hidden parked dir present (invisible to readers)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(s"$dir/lang=en")
    val parked = new org.apache.hadoop.fs.Path(s"$dir/.merge_old_lang=en")
    assert(fs.rename(live, parked))
    assert(spark.read.parquet(dir).count() === 1) // reader sees de only
    // restart: re-delivered batch recovers the parked partition first
    val b2 = Seq((1L, "U", "a2", "en", 3L)).toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val got = spark.read.parquet(dir)
      .select("k", "name").orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a2"), (2L, "b")))
    assert(!fs.exists(parked))
  }

  test("streaming mergeInto with partitionCol routes batches through the partition-scoped path") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val changes = mem.toDF().toDF("k", "op", "name", "lang", "seq")
    val dir = tmp("mergesink-stream-part") + "/snap"
    val q = MergeSink.mergeInto(changes, dir, "k", "op", "seq",
      checkpoint = tmp("mergesink-stream-part-ckpt"),
      trigger = Trigger.ProcessingTime(0), partitionCol = Some("lang"))
    mem.addData((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
    q.processAllAvailable()
    val deBefore = fileSig(s"$dir/lang=de")
    mem.addData((1L, "U", "a2", "en", 3L), (3L, "I", "c", "en", 4L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a2", "en"), (2L, "b", "de"), (3L, "c", "en")))
    // the de partition was untouched by batch 2
    assert(fileSig(s"$dir/lang=de") === deBefore)
  }

  test("partition values with filesystem-hostile characters round-trip the swap") {
    // '=' , '/' and space must escape in the partition dir name exactly
    // the way Spark's own writer escapes them, or the swap renames the
    // wrong directory
    val dir = tmp("mergesink-partesc") + "/snap"
    val b1 = Seq((1L, "I", "a", "e n=/x", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))
    val b2 = Seq((1L, "U", "a2", "e n=/x", 3L)).toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val got = spark.read.parquet(dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a2", "e n=/x"), (2L, "b", "de")))
  }

  test("a null partition value in the change set is rejected, not dropped") {
    val dir = tmp("mergesink-partnull") + "/snap"
    val b = Seq((1L, "I", "a", null.asInstanceOf[String], 1L))
      .toDF("k", "op", "name", "lang", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, b, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e.getMessage.contains("null 'lang'"))
  }

  test("an empty-string partition value is rejected like null, not silently lost") {
    // Spark's dynamic-partition writer folds '' into the null partition
    // (__HIVE_DEFAULT_PARTITION__), so the swap would look for 'lang='
    // (never staged) and read it as partition-fully-deleted — the merged
    // rows would vanish while the batch reported success
    val dir = tmp("mergesink-partempty") + "/snap"
    val b = Seq((1L, "I", "a", "", 1L)).toDF("k", "op", "name", "lang", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, b, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e.getMessage.contains("empty-string 'lang'"))
  }

  test("a whole-snapshot park from a crashed unpartitioned swap recovers before a partitioned merge") {
    // crash simulation: snapshot parked at <dir>.old, live dir missing —
    // the unpartitioned swap's mid-crash state. A restart that switched
    // to partitionCol mode must FIRST restore the park (recovery cannot
    // depend on the configured mode), then refuse the flat layout loudly
    // instead of merging against empty and burying the restored data.
    val base = tmp("mergesink-modeswitch")
    val dir = base + "/snap"
    val b1 = Seq((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", None) // unpartitioned
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old"))) // simulate the crash window
    val b2 = Seq((1L, "U", "a2", "en", 3L)).toDF("k", "op", "name", "lang", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e.getMessage.contains("not Hive-partitioned"))
    // the parked snapshot was restored BEFORE the refusal — nothing lost
    val got = spark.read.parquet(dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "en"), (2L, "b", "de")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")))
  }

  test("a partition move (D old + I new in one batch) relocates the key") {
    val dir = tmp("mergesink-partmove") + "/snap"
    val b1 = Seq((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"))
    // key 2 moves de -> en within ONE micro-batch: per-(key, partition)
    // compaction must keep BOTH rows so the D can erase the stale copy
    val b2 = Seq((2L, "D", "b", "de", 3L), (2L, "I", "b2", "en", 4L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val got = spark.read.parquet(dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a", "en"), (2L, "b2", "en")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/lang=de")))
  }

  test("two non-D rows for one key across partitions are rejected, not duplicated") {
    val dir = tmp("mergesink-partdup") + "/snap"
    val b = Seq((1L, "I", "a", "en", 1L), (1L, "I", "a2", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, b, dir, "k", "op", "seq", Some("lang"))
    }
    assert(e.getMessage.contains("partition move"))
  }

  // ---- manifest-commit protocol (object-store simulation) ----

  /** snapshot path on the rename-forbidding filesystem */
  private def noRenameDir(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.norename.impl", classOf[NoRenameFs].getName)
    "norename://" + tmp(prefix) + "/snap"
  }

  test("manifest commit: whole-snapshot merge without a single rename") {
    val dir = noRenameDir("mergesink-manifest")
    val b1 = Seq((1L, "I", "a", 1.0, 1L), (2L, "I", "b", 2.0, 2L))
      .toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq",
      manifestCommit = true)
    val s1 = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(s1 === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // second batch auto-detects the manifest (no flag needed)
    val b2 = Seq((1L, "D", "a", 0.0, 3L), (2L, "U", "b2", 3.0, 4L),
      (3L, "I", "c", 9.0, 5L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq")
    val s2 = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(s2 === Seq((2L, "b2", 3.0), (3L, "c", 9.0)))
    // re-delivery of the same batch is idempotent
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq")
    val s3 = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(s3 === s2)
  }

  test("manifest commit: torn commit file and orphan generation are recovered") {
    val dir = noRenameDir("mergesink-manifest-crash")
    val b1 = Seq((1L, "I", "a", 1.0, 1L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq",
      manifestCommit = true)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a crash mid-batch-2: a fully staged generation exists but
    // the commit file upload tore half-way (no trailer)
    val orphan = new org.apache.hadoop.fs.Path(dir + "/data/g-000000000002")
    fs.mkdirs(orphan)
    // age the debris past the staged-grace window: real crash debris is
    // old by the time the re-delivered batch runs; fresh unreferenced
    // dirs are deliberately LEFT by GC (they may be an in-flight peer)
    fs.setTimes(orphan, System.currentTimeMillis() - 600000L, -1L)
    val tornPath =
      new org.apache.hadoop.fs.Path(dir + "/_graft_commit-000000000002")
    val torn = fs.create(tornPath, false)
    torn.write("graft-commit v1 2\ng-000000000002\n".getBytes("UTF-8")) // no trailer
    torn.close()
    // the torn pointer is grace-gated too (a fresh one may be a peer's
    // flip in progress — MergeCrashSpec covers that); age it like the
    // generation debris
    fs.setTimes(tornPath, System.currentTimeMillis() - 600000L, -1L)
    // the torn commit must NOT be read as live
    val seen = graft.operators.Merge.readSnapshot(spark, dir)
      .as[(Long, String, Double)].collect().toSeq
    assert(seen === Seq((1L, "a", 1.0)))
    // re-delivered batch 2: preamble GC clears the debris, then applies
    val b2 = Seq((2L, "I", "b", 2.0, 2L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq")
    val got = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
  }

  test("manifest commit: partition-scoped merge, untouched generation byte-identical, moves and full-deletes work") {
    val dir = noRenameDir("mergesink-manifest-part")
    val b1 = Seq(
      (1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L),
      (3L, "I", "c", "de", 3L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"),
      manifestCommit = true)
    // resolve v1's actual (writer-unique) generation dir name under de
    val deGen = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data/lang=de")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val gens = fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("g-000000000001"))
      assert(gens.length === 1, gens.toSeq.toString)
      s"$dir/data/lang=de/${gens.head}"
    }
    val deBefore = fileSig(deGen)
    // batch 2 touches only en
    val b2 = Seq((1L, "U", "a2", "en", 4L), (9L, "I", "z", "en", 5L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    val got = graft.operators.Merge.readSnapshot(spark, dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq((1L, "a2", "en"), (2L, "b", "de"),
      (3L, "c", "de"), (9L, "z", "en")))
    // de's generation dir was neither rewritten nor replaced
    assert(fileSig(deGen) === deBefore)
    // batch 3: key 3 moves de -> en, key 2's delete empties nothing yet
    val b3 = Seq((3L, "D", "c", "de", 6L), (3L, "I", "c2", "en", 7L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b3, dir, "k", "op", "seq", Some("lang"))
    val afterMove = graft.operators.Merge.readSnapshot(spark, dir)
      .select("k", "name", "lang").orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(afterMove === Seq((1L, "a2", "en"), (2L, "b", "de"),
      (3L, "c2", "en"), (9L, "z", "en")))
    // batch 4: deleting de's last key drops the partition from the manifest
    val b4 = Seq((2L, "D", "b", "de", 8L)).toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b4, dir, "k", "op", "seq", Some("lang"))
    val afterDel = graft.operators.Merge.readSnapshot(spark, dir)
      .select("k", "lang").as[(Long, String)].collect().toSeq.sorted
    assert(afterDel.forall(_._2 === "en"))
    assert(afterDel.map(_._1) === Seq(1L, 3L, 9L))
  }

  test("a drained partitioned manifest keeps its schema and refuses a whole-snapshot merge") {
    val dir = tmp("mergesink-drain") + "/snap"
    val b1 = Seq((1L, "I", "a", "en", 1L), (2L, "I", "b", "de", 2L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq", Some("lang"),
      manifestCommit = true)
    // a batch deletes EVERY remaining row of every live partition
    val b2 = Seq((1L, "D", "a", "en", 3L), (2L, "D", "b", "de", 4L))
      .toDF("k", "op", "name", "lang", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq", Some("lang"))
    // the drained snapshot is empty but NOT schema-less: downstream
    // selects and typed reads keep working (resolved through the
    // retained predecessor commit)
    val drained = graft.operators.Merge.readSnapshot(spark, dir)
    assert(drained.columns.sorted === Array("k", "lang", "name"))
    assert(drained.select("k", "name").count() === 0L)
    // the empty live list must not vacuously pass the whole-snapshot
    // mode guard: layout mode survives the drain
    val b3 = Seq((3L, "I", "c", "en", 5L)).toDF("k", "op", "name", "lang", "seq")
    val e = intercept[IllegalArgumentException] {
      MergeSink.applyBatch(spark, b3, dir, "k", "op", "seq", None)
    }
    assert(e.getMessage.contains("partition-scoped manifest"))
    // and the partitioned path refills it
    MergeSink.applyBatch(spark, b3, dir, "k", "op", "seq", Some("lang"))
    val got = graft.operators.Merge.readSnapshot(spark, dir)
      .select("k", "name", "lang").as[(Long, String, String)].collect().toSeq
    assert(got === Seq((3L, "c", "en")))
  }

  test("a transient commit-read failure fails the batch loudly instead of gc deleting the live commit") {
    // parse() must treat an I/O error as UNREADABLE (propagate), never
    // as torn: swallowing it would make read() fall back to the
    // predecessor and gc delete the real live commit + its generations
    // — permanent loss of committed data on a store having a transient
    // bad moment
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakyopen.impl", classOf[FlakyOpenFs].getName)
    val dir = "flakyopen://" + tmp("mergesink-flaky") + "/snap"
    val b1 = Seq((1L, "I", "a", 1.0, 1L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b1, dir, "k", "op", "seq",
      manifestCommit = true)
    val b2 = Seq((2L, "I", "b", 2.0, 2L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b2, dir, "k", "op", "seq")
    FlakyOpenFs.failCommitOpens = true
    try {
      val b3 = Seq((3L, "I", "c", 3.0, 3L)).toDF("k", "op", "name", "bal", "seq")
      intercept[java.io.IOException] {
        MergeSink.applyBatch(spark, b3, dir, "k", "op", "seq")
      }
    } finally FlakyOpenFs.failCommitOpens = false
    // nothing was deleted: the snapshot still resolves to batch 2's state
    val got = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // once the store recovers, the failed batch re-applies cleanly
    val b3 = Seq((3L, "I", "c", 3.0, 3L)).toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, b3, dir, "k", "op", "seq")
    val after = graft.operators.Merge.readSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(after === Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("intra-batch multi-versions compact by seq before merging") {
    val dir = tmp("mergesink-seq") + "/snap"
    // same key three times in one batch; highest seq (a delete) wins
    val batch = Seq((1L, "I", "a", 1.0, 10L), (1L, "U", "a2", 2.0, 11L),
      (1L, "D", "a2", 0.0, 12L), (2L, "I", "b", 5.0, 1L))
      .toDF("k", "op", "name", "bal", "seq")
    MergeSink.applyBatch(spark, batch, dir, "k", "op", "seq")
    val got = spark.read.parquet(dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "b", 5.0)))
  }
}
