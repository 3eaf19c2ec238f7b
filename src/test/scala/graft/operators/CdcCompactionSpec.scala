package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("latestSnapshot: latest op wins; deleted keys vanish") {
    val log = Seq(
      (1L, 10L, "insert", "a"),
      (1L, 20L, "update", "b"),  // latest for key 1
      (2L, 10L, "insert", "c"),
      (2L, 30L, "delete", "c"),  // key 2 deleted
      (3L, 5L, "insert", "d"),
      (3L, 5L, "update", "e")    // tie on t → tiebreak col wins? no: add seq
    ).zipWithIndex.map { case ((k, t, op, v), i) => (k, t, i.toLong, op, v) }
      .toDF("k", "t", "seq", "op", "v")
    val snap = CdcMaterializer.latestSnapshot(log, Seq("k"),
        Seq(col("t"), col("seq")), "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(snap === Map(1L -> "b", 3L -> "e"))
  }

  test("latestSnapshot: a NULL latest op is data, never a silent delete") {
    // a source that stamps op only on updates/deletes: the bare =!=
    // would null-propagate in the filter and drop the key as deleted
    val log = Seq(
      (1L, 10L, 0L, Option.empty[String], "a"),
      (2L, 10L, 1L, Some("insert"), "b"),
      (2L, 20L, 2L, Option.empty[String], "b2"), // null-op latest: keep
      (3L, 10L, 3L, Some("delete"), "c")
    ).toDF("k", "t", "seq", "op", "v")
    val snap = CdcMaterializer.latestSnapshot(log, Seq("k"),
        Seq(col("t"), col("seq")), "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(snap === Map(1L -> "a", 2L -> "b2"))
  }

  test("scd2History: intervals chain gaplessly; deletes close without emitting") {
    val log = Seq(
      (1L, 10L, 0L, "insert", "a"),
      (1L, 20L, 1L, "update", "b"),
      (1L, 30L, 2L, "update", "c"),   // key 1: three versions, c current
      (2L, 10L, 3L, "insert", "d"),
      (2L, 30L, 4L, "delete", "d"),   // key 2: version closed at 30, none current
      (3L, 5L, 5L, "insert", "e"),
      (3L, 5L, 6L, "update", "f")     // same ts → seq tiebreak orders versions
    ).toDF("k", "t", "seq", "op", "v")
    val hist = CdcMaterializer.scd2History(log, Seq("k"), "t", Seq("seq"), "op")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(hist === Set(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      (2L, "d", 10L, Some(30L), false),  // closed by the delete, not current
      (3L, "e", 5L, Some(5L), false),
      (3L, "f", 5L, None, true)))
    // exactly one current version per surviving key
    val current = hist.filter(_._5).map(_._1)
    assert(current === Set(1L, 3L))
  }

  test("compactParquet shrinks many small files to a size-targeted few") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 16 tiny files
    spark.range(0, 1000).toDF("v").repartition(16).write.parquet(dir)
    def count(d: String) = {
      def rec(f: java.io.File): Int =
        Option(f.listFiles()).toSeq.flatten.map {
          case x if x.isDirectory => rec(x)
          case x if x.getName.endsWith(".parquet") => 1
          case _ => 0
        }.sum
      rec(new java.io.File(d))
    }
    assert(count(dir) === 16)
    val (before, after) = Compaction.compactParquet(spark, dir)
    assert(before === 16 && after === 1)
    // content preserved
    assert(spark.read.parquet(dir).agg(sum("v")).head().getLong(0) === 499500L)
  }

  test("compactParquet recovers a crash between park and promote") {
    val dir = java.nio.file.Files.createTempDirectory("compact-rec")
      .toString + "/t"
    spark.range(0, 100).toDF("v").repartition(4).write.parquet(dir)
    // simulate the crash window: live dir parked, promote never ran
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val parked = new org.apache.hadoop.fs.Path(
      live.getParent, "." + live.getName + ".compact_bak")
    assert(fs.rename(live, parked))
    // the recovery preamble restores the parked data before compacting
    val (before, after) = Compaction.compactParquet(spark, dir)
    assert(before === 4 && after === 1)
    assert(spark.read.parquet(dir).agg(sum("v")).head().getLong(0) === 4950L)
    assert(!fs.exists(parked))
  }

  test("compactParquet clears a stale parked dir (crash after promote) before re-parking") {
    val dir = java.nio.file.Files.createTempDirectory("compact-stale")
      .toString + "/t"
    spark.range(0, 100).toDF("v").repartition(4).write.parquet(dir)
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val parked = new org.apache.hadoop.fs.Path(
      live.getParent, "." + live.getName + ".compact_bak")
    // crash window: promote already ran (live is current) but the
    // parked pre-compact copy was never deleted — stale old data
    spark.range(100, 200).toDF("v").write.parquet(parked.toString)
    // without the pre-park clear, rename(live, parked) would nest live
    // INSIDE the stale dir and a later recovery would read old+new rows
    val (before, after) = Compaction.compactParquet(spark, dir)
    assert(before === 4 && after === 1)
    assert(spark.read.parquet(dir).agg(sum("v")).head().getLong(0) === 4950L)
    assert(spark.read.parquet(dir).count() === 100L)
    assert(!fs.exists(parked))
  }
}
