package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.{BloomIndex, ZoneMap}

/** The maintenance stream must keep both skipping indexes exactly in
  * step with a landing parquet dir: after each tick the staleness
  * guard passes, scans match plain filters, and re-ticking with no new
  * files changes nothing. */
class IndexMaintainStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("ticks cover landing waves; scans stay correct; refresh is idempotent") {
    val data = tmp("ims-data")
    val zstats = tmp("ims-z") + "/stats"
    val bstats = tmp("ims-b") + "/stats"
    val ckpt = tmp("ims-ckpt")
    val idx = IndexMaintainStream.Indexes(
      zone = Some((zstats, Seq("k"))),
      bloom = Some((bstats, Seq("k"))),
      bloomExpectedItems = 100L)

    def fileCount = spark.read.parquet(data).inputFiles.length
    def zRows = spark.read.parquet(zstats).count()
    def bRows = spark.read.parquet(bstats).count()

    // wave 1 lands before the stream starts (backlog)
    (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(2, col("k"))
      .write.mode("overwrite").parquet(data)
    val q1 = IndexMaintainStream.maintain(spark, data, idx, ckpt,
      trigger = Trigger.AvailableNow())
    q1.awaitTermination()
    assert(zRows === fileCount && bRows === fileCount)
    assert(ZoneMap.scanRange(spark, data, zstats,
        Seq(ZoneMap.Range("k", 3L, 5L)))
      .select("k").as[Long].collect().toSet === Set(3L, 4L, 5L))

    // wave 2 lands; a fresh AvailableNow run (same checkpoint) ticks
    (21L to 30L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(1, col("k"))
      .write.mode("append").parquet(data)
    val q2 = IndexMaintainStream.maintain(spark, data, idx, ckpt,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(zRows === fileCount && bRows === fileCount)
    assert(ZoneMap.scanRange(spark, data, zstats,
        Seq(ZoneMap.Range("k", 19L, 22L)))
      .select("k").as[Long].collect().toSet ===
      Set(19L, 20L, 21L, 22L))
    assert(BloomIndex.scanIn(spark, data, bstats, "k", Seq(7L, 25L))
      .select("k").as[Long].collect().toSet === Set(7L, 25L))

    // idempotent: a refresh with no new files changes nothing
    val (z0, b0) = (zRows, bRows)
    IndexMaintainStream.refresh(spark, data, idx)
    assert(zRows === z0 && bRows === b0)
  }

  test("the gap between landing and tick is guarded, then heals") {
    val data = tmp("ims-data2")
    val zstats = tmp("ims-z2") + "/stats"
    val idx = IndexMaintainStream.Indexes(zone = Some((zstats, Seq("k"))))
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(data)
    IndexMaintainStream.refresh(spark, data, idx)

    // a file lands with no tick yet: reads refuse rather than drop
    Seq((9L, "z")).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(data)
    val e = intercept[IllegalArgumentException] {
      ZoneMap.scanRange(spark, data, zstats, Seq(ZoneMap.Range("k", 0L, 10L)))
    }
    assert(e.getMessage.contains("stale"))

    IndexMaintainStream.refresh(spark, data, idx)
    assert(ZoneMap.scanRange(spark, data, zstats,
        Seq(ZoneMap.Range("k", 0L, 10L)))
      .select("k").as[Long].collect().toSet === Set(1L, 2L, 9L))
  }
}
