package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._
  import ZoneMap.Range

  private def scratch(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("scanRange ≡ unskipped filter, and actually skips files") {
    val data = scratch("zm-data")
    val stats = scratch("zm-stats")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Layout.zOrdered(li, "l_orderkey", "l_partkey", bits = 16, numFiles = 8)
      .write.mode("overwrite").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("l_orderkey", "l_partkey"))

    val ranges = Seq(Range("l_orderkey", 100L, 900L),
      Range("l_partkey", 1L, 120L))
    val got = ZoneMap.scanRange(spark, data, stats, ranges)
    val want = spark.read.parquet(data)
      .filter(col("l_orderkey").between(100, 900) &&
        col("l_partkey").between(1, 120))
    assert(got.select("l_orderkey", "l_linenumber").as[(Long, Int)]
      .collect().toSet ===
      want.select("l_orderkey", "l_linenumber").as[(Long, Int)]
        .collect().toSet)
    assert(want.count() > 0)

    // the z-ordered layout gives narrow per-file ranges: a selective
    // 2-D range must prune at least one of the 8 files
    val total = spark.read.parquet(data).inputFiles.length
    val read = ZoneMap.prunedFiles(spark, stats, ranges).size
    assert(total === 8)
    assert(read < total, s"expected skipping, read $read/$total")
    assert(got.inputFiles.length === read)
  }

  test("append indexes only new files; stale stats fail loudly") {
    val data = scratch("zm-data2")
    val stats = scratch("zm-stats2")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("k"))
    val statRows0 = spark.read.parquet(stats).count()

    // new file lands without stats → scan refuses rather than dropping
    Seq((10L, "c")).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(data)
    val e = intercept[IllegalArgumentException] {
      ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 0L, 100L)))
    }
    assert(e.getMessage.contains("stale"))

    ZoneMap.append(spark, data, stats, Seq("k"))
    val after = spark.read.parquet(stats)
    assert(after.count() === statRows0 + 1) // only the new file indexed
    // idempotent: a second append adds nothing
    ZoneMap.append(spark, data, stats, Seq("k"))
    assert(spark.read.parquet(stats).count() === statRows0 + 1)

    val got = ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 5L, 100L)))
    assert(got.as[(Long, String)].collect().toSet === Set((10L, "c")))
  }

  test("stats referencing a deleted data file fail loudly, naming the rebuild") {
    val data = scratch("zm-dead-data")
    val stats = scratch("zm-dead-stats")
    Seq((1L, "a")).toDF("k", "v").repartition(1)
      .write.mode("overwrite").parquet(data)
    Seq((2L, "b")).toDF("k", "v").repartition(1)
      .write.mode("append").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("k"))
    // a file vanishes (manual delete / external rewrite): the scan must
    // fail up front with the fix named, not die path-not-found mid-read
    // — and append() cannot heal this direction
    val p = new org.apache.hadoop.fs.Path(data)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val victim = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    fs.delete(victim, false)
    val e = intercept[IllegalArgumentException] {
      ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 0L, 100L)))
    }
    assert(e.getMessage.contains("deleted data file") &&
      e.getMessage.contains("build()"))
    // rebuild heals
    ZoneMap.build(spark, data, stats, Seq("k"))
    assert(ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 0L, 100L)))
      .count() === 1)
  }

  test("all-null tracked column skips under a range; empty survivor set keeps schema") {
    val data = scratch("zm-data3")
    val stats = scratch("zm-stats3")
    Seq((Some(1L), "a"), (Some(2L), "b")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(data)
    Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
      .toDF("k", "v").repartition(1).write.mode("append").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("k"))

    // all-null file is skipped, rows from the real file still match
    val got = ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 1L, 2L)))
    assert(got.as[(Option[Long], String)].collect().toSet ===
      Set((Some(1L), "a"), (Some(2L), "b")))
    assert(got.inputFiles.length === 1)

    // a range matching nothing: empty result, schema intact
    val none = ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 50L, 60L)))
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "v"))
  }

  test("file-list cap: too many survivors degrade to the un-skipped scan") {
    val data = scratch("zm-data4")
    val stats = scratch("zm-stats4")
    // range layout: narrow per-file [min,max], so selectivity decides
    // how many files survive
    (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("k"))

    val ranges = Seq(Range("k", 1L, 40L)) // every file survives
    assert(ZoneMap.prunedFilesCapped(spark, stats, ranges).get.size === 4)

    spark.conf.set(ZoneMap.MaxFilesKey, "2")
    try {
      // over the cap: the capped list is None…
      assert(ZoneMap.prunedFilesCapped(spark, stats, ranges).isEmpty)
      // …and the scan falls back but stays CORRECT
      val got = ZoneMap.scanRange(spark, data, stats, ranges)
      assert(got.as[(Long, String)].collect().toSet ===
        (1L to 40L).map(i => (i, s"v$i")).toSet)
      assert(got.inputFiles.length === 4) // un-skipped: reads the dir
      // a selective range back under the cap still skips
      val sel = ZoneMap.scanRange(spark, data, stats,
        Seq(Range("k", 7L, 7L)))
      assert(sel.as[(Long, String)].collect().toSet === Set((7L, "v7")))
      assert(sel.inputFiles.length < 4)
    } finally spark.conf.unset(ZoneMap.MaxFilesKey)

    // the "effectively unlimited" setting must not wrap limit negative
    spark.conf.set(ZoneMap.MaxFilesKey, Int.MaxValue.toString)
    try assert(ZoneMap.prunedFilesCapped(spark, stats, ranges).get.size === 4)
    finally spark.conf.unset(ZoneMap.MaxFilesKey)
  }

  test("hive-partitioned data dir: skip-scan keeps the partition column and matches the full scan") {
    // the streaming sinks write hive-partitioned layouts; reading a
    // pruned EXPLICIT file list without basePath would silently drop
    // the partition column — a schema change between the skipped and
    // fallback paths, and a crash for scans filtering on it
    val data = scratch("zm-part")
    val stats = scratch("zm-part-stats")
    (1L to 40L).map(i => (i, s"p${i % 4}", s"v$i")).toDF("k", "part", "v")
      .repartition(4, col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(data)
    ZoneMap.build(spark, data, stats, Seq("k"))
    val got = ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 5L, 12L)))
    // partition column present and correct on the SKIPPED path
    assert(got.columns.toSet === Set("k", "part", "v"))
    val want = spark.read.parquet(data).filter(col("k").between(5, 12))
      .select("k", "part", "v").as[(Long, String, String)].collect().toSet
    assert(got.select("k", "part", "v").as[(Long, String, String)]
      .collect().toSet === want)
    assert(want.nonEmpty)
    // append path re-reads explicit files too — same basePath contract
    (41L to 44L).map(i => (i, s"p${i % 4}", s"v$i")).toDF("k", "part", "v")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(data)
    ZoneMap.append(spark, data, stats, Seq("k"))
    val after = ZoneMap.scanRange(spark, data, stats, Seq(Range("k", 41L, 44L)))
      .select("k", "part").as[(Long, String)].collect().toSet
    assert(after === (41L to 44L).map(i => (i, s"p${i % 4}")).toSet)
  }
}
