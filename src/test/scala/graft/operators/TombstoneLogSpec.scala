package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The shared tombstone op log's resolution and its two file-level
  * maintenance moves (fold, clear). The load-bearing hazard both are
  * built around: an id's D and R records can live in DIFFERENT files,
  * so any multi-file deletion can transiently (or, after a crash,
  * persistently) drop the R file while keeping the D file — which
  * would resolve a live, REVIVED id as deleted, and a later compaction
  * would then physically remove its row. The fold's checkpoint
  * therefore covers EVERY id (latest op, D and R rows both) and the
  * clear supersedes with an all-R checkpoint before deleting anything.
  * These tests construct the crash-window disk states directly and
  * assert each resolves safely. */
class TombstoneLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmpLog(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/deleted"

  private def deadSet(path: String): Set[Long] =
    TombstoneLog.resolved(spark, path, "id")
      .map(_.as[Long].collect().toSet).getOrElse(Set.empty)

  test("latest seq wins; legacy one-column files read as (id, 0, D); mixed files merge") {
    val path = tmpLog("tslog")
    // legacy file: bare ids
    Seq(1L, 2L).toDF("id").coalesce(1).write.mode("append").parquet(path)
    assert(deadSet(path) === Set(1L, 2L))
    // revive 1 at seq 1, re-delete at seq 2, revive at seq 3
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "R")
    assert(deadSet(path) === Set(2L))
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "D")
    assert(deadSet(path) === Set(1L, 2L))
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "R")
    assert(deadSet(path) === Set(2L))
    assert(TombstoneLog.nextSeq(spark, path, "id") === 4L)
  }

  test("fold checkpoint covers REVIVED ids: the partial-deletion window can never falsely tombstone a live row") {
    val path = tmpLog("tsfold")
    // X deleted then revived (two files); Y standing
    TombstoneLog.append(spark, Seq(100L).toDF("id"), path, "id", "D")
    TombstoneLog.append(spark, Seq(100L).toDF("id"), path, "id", "R")
    TombstoneLog.append(spark, Seq(200L).toDF("id"), path, "id", "D")
    spark.conf.set("spark.graft.tombstoneLogFoldFiles", "1")
    try {
      TombstoneLog.maybeFold(spark, path, "id")
      // post-fold resolution unchanged
      assert(deadSet(path) === Set(200L))
      // the checkpoint (now the only file) must carry X's R row: the
      // exact crash state "old files gone, checkpoint alone" resolves
      // X as revived, not as absent-then-resurrected-by-stale-D
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      assert(files.length === 1, "fold must leave exactly the checkpoint")
      val ops = spark.read.parquet(path).select("id", "op")
        .as[(Long, String)].collect().toSet
      assert(ops === Set((100L, "R"), (200L, "D")))
      // the WORST partial state of a crashed fold: checkpoint written,
      // NO old file deleted yet — union still resolves identically
      TombstoneLog.append(spark, Seq(100L).toDF("id"), path, "id", "D")
      TombstoneLog.append(spark, Seq(100L).toDF("id"), path, "id", "R")
      assert(deadSet(path) === Set(200L))
    } finally spark.conf.unset("spark.graft.tombstoneLogFoldFiles")
  }

  test("clear supersedes first: every partial state resolves to no-tombstones or a safe subset, and the dir ends gone") {
    val path = tmpLog("tsclear")
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "D")
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "R")
    TombstoneLog.append(spark, Seq(2L).toDF("id"), path, "id", "D")
    // hand-build the crash state clear() is designed against: the all-R
    // checkpoint committed, the R file deleted, the stale D file kept
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preCkpt = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    Seq(1L, 2L).toDF("id")
      .withColumn("seq", lit(TombstoneLog.nextSeq(spark, path, "id")))
      .withColumn("op", lit("R"))
      .coalesce(1).write.mode("append").parquet(path)
    // drop one PRE-checkpoint file (arbitrary deletion order mid-crash)
    fs.delete(preCkpt.head, false)
    assert(deadSet(path) === Set.empty,
      "a surviving stale D must be superseded by the checkpoint")
    // the real clear from this state finishes the job
    TombstoneLog.clear(spark, path, "id")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))
    assert(deadSet(path) === Set.empty)
  }

  test("a reader racing a fold's file deletion fails LOUDLY even under session-level ignoreMissingFiles — silent-empty tombstones would be a resurrection") {
    val path = tmpLog("tsrace")
    TombstoneLog.append(spark, Seq(1L).toDF("id"), path, "id", "D")
    TombstoneLog.append(spark, Seq(2L).toDF("id"), path, "id", "D")
    // the hostile session default the per-read override must beat
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      // plan the read first (captures the 2-file listing), then a fold
      // concurrently deletes one file out from under it
      val resolved = TombstoneLog.resolved(spark, path, "id").get
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      // delete id 1's file specifically (listStatus order is not
      // deterministic, and the post-race assertion below needs to
      // know which id's record survived)
      val id1File = files.find(f => spark.read
        .parquet(f.getPath.toString)
        .filter(col("id") === 1L).count() > 0).get
      fs.delete(id1File.getPath, false)
      val e = intercept[Exception] { resolved.collect() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(
        _.isInstanceOf[java.io.FileNotFoundException]),
        s"expected a loud FileNotFoundException, got $e")
      // a FRESH read (post-fold interleaving) resolves correctly
      assert(deadSet(path) === Set(2L))
    } finally spark.conf.unset("spark.sql.files.ignoreMissingFiles")
  }
}
