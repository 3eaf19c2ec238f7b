package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** reference Morton encode. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zValue matches the reference interleave on random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 21).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === morton(a, b, 21), s"($a,$b)") }
  }

  test("zSql is the identical expression (spot-check via Spark SQL parser)") {
    // the generated SQL is standard enough that Spark parses it too —
    // evaluating it must agree with the Column form.
    val df = Seq((123456L, 654321L)).toDF("a", "b")
    val viaSql = df.selectExpr(s"(${Layout.zSql("a", "b", 21)}) AS z")
      .as[Long].head()
    assert(viaSql === morton(123456L, 654321L, 21))
  }

  test("zOrdered clusters BOTH dimensions; single-column sort only one") {
    // 64x64 uniform grid -> 16 z-range partitions should be ~16x16
    // tiles: per-partition extent well under half the range on both
    // dims. A sort on `a` alone leaves b's extent at ~full range.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    def meanExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("a") - min("a")).as("ea"), (max("b") - min("b")).as("eb"))
        .agg(avg("ea"), avg("eb")).as[(Double, Double)].head()
      e
    }
    val (za, zb) = meanExtents(Layout.zOrdered(grid, "a", "b", bits = 6, numFiles = 16))
    assert(za <= 26 && zb <= 26, s"z-order extents ($za, $zb) should be ~15")
    val (sa, sb) = meanExtents(grid.repartitionByRange(16, col("a")))
    assert(sa <= 8, s"a-sort clusters a (got $sa)")
    assert(sb >= 50, s"a-sort leaves b unclustered (got $sb)")
  }

  test("tileStats: tiles partition the data; min/max bound every row") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(2000)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("a", "b")
    val stats = Layout.tileStats(data, "a", "b", bits = 10, tileBits = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum === 2000L)                // counts conserve
    assert(stats.map(_._1).distinct.length === stats.length)
    stats.foreach { case (_, n, mina, maxa, minb, maxb) =>
      assert(n > 0 && mina <= maxa && minb <= maxb)
    }
    // tiles are genuinely selective: tileBits=4 takes the top 2 bits
    // of each 10-bit dim, so a tile spans at most a 256-wide quadrant
    stats.foreach { case (tid, _, mina, maxa, minb, maxb) =>
      assert(maxa - mina < 256 && maxb - minb < 256, s"tile $tid too wide")
    }
  }
}
