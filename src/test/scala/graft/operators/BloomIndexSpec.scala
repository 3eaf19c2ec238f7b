package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("scanIn ≡ plain isin, and skips files zone maps cannot") {
    val data = scratch("bi-data")
    val stats = scratch("bi-stats")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    // hash layout on l_suppkey: every file's l_orderkey RANGE spans the
    // table (min/max pruning would keep all 16), but each specific key
    // lands in only the files that actually hold its rows
    li.repartition(16, col("l_suppkey"))
      .write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, stats, Seq("l_orderkey"),
      expectedItems = 10000L)

    val keys = Seq(1L, 700L, 1400L)
    val got = BloomIndex.scanIn(spark, data, stats, "l_orderkey", keys)
    val want = spark.read.parquet(data)
      .filter(col("l_orderkey").isin(keys: _*))
    assert(got.select("l_orderkey", "l_linenumber").as[(Long, Int)]
      .collect().toSet ===
      want.select("l_orderkey", "l_linenumber").as[(Long, Int)]
        .collect().toSet)
    assert(want.count() > 0)

    // hash partitioning may leave some of the 16 partitions empty (no
    // file written) — assert on the files that exist, not a fixed 16
    val total = spark.read.parquet(data).inputFiles.length
    val read = BloomIndex.prunedFiles(spark, data, stats,
      "l_orderkey", keys).size
    assert(total > 4)
    assert(read < total, s"expected skipping, read $read/$total")
    assert(got.inputFiles.length === read)
  }

  test("probe literal type mismatch is healed by the schema cast") {
    val data = scratch("bi-data2")
    val stats = scratch("bi-stats2")
    Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("k", "v")
      .repartition(3, col("k")).write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, stats, Seq("k"), expectedItems = 10L)
    // Int probes against a Long column: xxhash64(100: Int) differs from
    // xxhash64(100L); without the cast the bloom would miss every file
    val got = BloomIndex.scanIn(spark, data, stats, "k", Seq(100, 300))
    assert(got.select("k", "v").as[(Long, String)].collect().toSet ===
      Set((100L, "a"), (300L, "c")))
  }

  test("append indexes only new files; stale index fails loudly") {
    val data = scratch("bi-data3")
    val stats = scratch("bi-stats3")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, stats, Seq("k"), expectedItems = 10L)
    val statRows0 = spark.read.parquet(stats).count()

    Seq((10L, "c")).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(data)
    val e = intercept[IllegalArgumentException] {
      BloomIndex.scanIn(spark, data, stats, "k", Seq(10L))
    }
    assert(e.getMessage.contains("stale"))

    BloomIndex.append(spark, data, stats, Seq("k"), expectedItems = 10L)
    assert(spark.read.parquet(stats).count() === statRows0 + 1)
    BloomIndex.append(spark, data, stats, Seq("k"), expectedItems = 10L)
    assert(spark.read.parquet(stats).count() === statRows0 + 1)

    val got = BloomIndex.scanIn(spark, data, stats, "k", Seq(10L))
    assert(got.as[(Long, String)].collect().toSet === Set((10L, "c")))
  }

  test("no-match probe keeps schema; missing column rejected") {
    val data = scratch("bi-data4")
    val stats = scratch("bi-stats4")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, stats, Seq("k"), expectedItems = 10L)

    val none = BloomIndex.scanIn(spark, data, stats, "k", Seq(999L))
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "v"))

    val e = intercept[IllegalArgumentException] {
      BloomIndex.scanIn(spark, data, stats, "zzz", Seq(1L))
    }
    assert(e.getMessage.contains("not in data"))
  }

  test("file-list cap: too many survivors degrade to the un-skipped scan") {
    val data = scratch("bi-data5")
    val stats = scratch("bi-stats5")
    val rows = (1L to 40L).map(i => (i, s"v$i"))
    rows.toDF("k", "v").repartition(4, col("k"))
      .write.mode("overwrite").parquet(data)
    BloomIndex.build(spark, data, stats, Seq("k"), expectedItems = 100L)

    // probes covering every file
    val keys = (1L to 40L)
    spark.conf.set(ZoneMap.MaxFilesKey, "2")
    try {
      val got = BloomIndex.scanIn(spark, data, stats, "k", keys)
      assert(got.as[(Long, String)].collect().toSet === rows.toSet)
      assert(got.inputFiles.length === 4) // fallback reads the dir
      // a single-key probe back under the cap still skips
      val sel = BloomIndex.scanIn(spark, data, stats, "k", Seq(7L))
      assert(sel.as[(Long, String)].collect().toSet === Set((7L, "v7")))
      assert(sel.inputFiles.length < 4)
    } finally spark.conf.unset(ZoneMap.MaxFilesKey)
  }
}
