package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Rollup

/** An in-distribution batch raises no alert; once shifted batches
  * accumulate, the running state's PSI against the frozen baseline
  * crosses the threshold and alerts carry the batch id. */
class DriftMonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  test("alerts fire only when the running distribution drifts") {
    implicit val sqlCtx = spark.sqlContext
    val h = Rollup.HistSpec("x", 0.0, 10.0, 10)
    val spec = Rollup.Spec(keys = Seq("k"), hists = Seq(h))
    def df(rows: Seq[Double]) = rows.map(v => ("g", v)).toDF("k", "x")

    // frozen baseline: uniform over the bins
    val baseline = Files.createTempDirectory("dm-base").toString + "/rollup"
    Rollup.init(spark, baseline,
      df((0 until 1000).map(i => (i % 10) + 0.5)), spec)

    val store = Files.createTempDirectory("dm-store").toString + "/rollup"
    val alerts = Files.createTempDirectory("dm-alerts").toString + "/alerts"
    val mem = MemoryStream[(String, Double)]
    val q = DriftMonitorStream.monitor(mem.toDF().toDF("k", "x"),
      store, baseline, Seq("k"), h,
      checkpoint = Files.createTempDirectory("dm-ckpt").toString,
      alertDir = alerts, threshold = 0.25,
      trigger = Trigger.ProcessingTime(0))

    // batch 0: same distribution — state matches baseline, no alert
    mem.addData((0 until 500).map(i => ("g", (i % 10) + 0.5)): _*)
    q.processAllAvailable()
    assert(spark.read.parquet(alerts).count() === 0)

    // batches of a collapsed distribution: the RUNNING state drifts
    mem.addData((0 until 2000).map(_ => ("g", 9.5)): _*)
    q.processAllAvailable()
    mem.addData((0 until 2000).map(_ => ("g", 9.5)): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(alerts)
    assert(got.count() >= 1)
    val top = got.orderBy(org.apache.spark.sql.functions.desc("batch_id"))
      .select("k", "psi", "batch_id").collect()(0)
    assert(top.getString(0) === "g")
    assert(top.getDouble(1) > 0.25)
    // the exact running state folded all three batches (no double count)
    val nRows = Rollup.read(spark, store)
      .select("n_rows").as[Long].head()
    assert(nRows === 4500L)
  }
}
