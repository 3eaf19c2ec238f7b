package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The card facade must inherit the rollup's fold ≡ scratch contract
  * and surface the profile columns (null counts included) as one wide
  * row. */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private val card = DataCard.Card(
    nulls = Seq("name"), sums = Seq("bal"),
    mins = Seq("bal"), maxs = Seq("bal"), ndvs = Seq("grp"),
    hists = Seq(Rollup.HistSpec("bal", 0.0, 100.0, 4)))

  private val rows = Seq(
    (1L, Some("a"), 10.0, "x"), (2L, None, 35.0, "y"),
    (3L, Some("c"), 60.0, "x"), (4L, None, 99.0, "z"),
    (5L, Some("e"), 5.0, "y"))

  private def df(r: Seq[(Long, Option[String], Double, String)]) =
    r.toDF("id", "name", "bal", "grp")

  test("folded card equals the from-scratch profile, one wide row") {
    val dir = Files.createTempDirectory("card").toString + "/card"
    val (h1, h2) = rows.splitAt(2)
    DataCard.init(spark, dir, df(h1), card)
    DataCard.fold(spark, dir, df(h2), card)

    val got = DataCard.read(spark, dir, card)
    assert(got.count() === 1)
    val r = got.collect()(0)
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("nulls__name") === 2L)
    assert(r.getAs[Double]("sum__bal") === 209.0)
    assert(r.getAs[Double]("avg__bal") === 209.0 / 5)
    assert(r.getAs[Double]("min__bal") === 5.0)
    assert(r.getAs[Double]("max__bal") === 99.0)
    assert(r.getAs[Double]("ndv__grp") === 3.0) // tiny set: HLL exact
    // histogram state serves quantiles without a corpus read
    val p50 = Rollup.read(spark, dir)
      .select(Rollup.histQuantile(card.hists.head, 0.5).as("p50"))
      .collect()(0).getDouble(0)
    assert(p50 === 37.5) // bin 1 of [0,100)/4 → midpoint 37.5
  }

  test("streaming maintenance keeps the card one read behind the stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("card-stream").toString + "/card"
    val ckpt = Files.createTempDirectory("card-ckpt").toString
    val mem = MemoryStream[(Long, Option[String], Double, String)]
    val q = DataCard.maintain(
      mem.toDF().toDF("id", "name", "bal", "grp"), dir, card, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val r = DataCard.read(spark, dir, card).collect()(0)
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("nulls__name") === 2L)
    assert(r.getAs[Double]("sum__bal") === 209.0)
  }
}
