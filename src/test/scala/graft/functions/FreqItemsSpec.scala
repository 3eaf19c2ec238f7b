package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries guarantees in both regimes: lossy (heavy hitters survive
  * with bounded undercount, across partial/merge) and exact (enough
  * slots ⇒ identical to groupBy — the q82 driver regime). */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("lossy regime: freq > n/k items survive merge with bounded undercount") {
    val rnd = new scala.util.Random(23)
    val stream = rnd.shuffle(
      Seq.fill(1500)("hh1") ++ Seq.fill(800)("hh2") ++
        (0 until 4000).map(i => s"rare${i % 400}"))
    val n = stream.size
    val k = 16
    val out = stream.toDF("tok").repartition(7) // forces partial + merge
      .agg(GraftFunctions.graftFreqItems(col("tok"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(String, Long)]
      .collect().toMap
    assert(out.size <= k - 1)
    // any item with true frequency > n/k must be present
    assert(out.contains("hh1") && out.contains("hh2"), out.keys.toSeq.sorted)
    // reported counts are lower bounds, undercounting by at most n/k
    assert(out("hh1") <= 1500 && out("hh1") >= 1500 - n / k)
    assert(out("hh2") <= 800 && out("hh2") >= 800 - n / k)
  }

  test("exact regime: slots >= distinct items reproduces groupBy counts") {
    val data = (0 until 3000).map(i => s"w${i % 20}")
    val got = data.toDF("tok").repartition(5)
      .agg(GraftFunctions.graftFreqItems(col("tok"), 64).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(String, Long)]
      .collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }
}
