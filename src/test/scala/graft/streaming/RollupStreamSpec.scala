package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Rollup

/** The streaming fold must equal the batch-mode fold sequence, and —
  * because a rollup fold is NOT naturally idempotent — re-delivering a
  * micro-batch must be recognized via the commit tag and skipped, while
  * a different stream's token must never be mistaken for ours. */
class RollupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val spec = Rollup.Spec(keys = Seq("k"), sums = Seq("x"))

  private val b0 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0))
  private val b1 = Seq(("a", 4.0), ("c", 7.0))

  test("streaming folds equal the batch fold sequence") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("rs-store") + "/rollup"
    val mem = MemoryStream[(String, Double)]
    val q = RollupStream.maintain(mem.toDF().toDF("k", "x"), store, spec,
      checkpoint = tmp("rs-ckpt"), trigger = Trigger.ProcessingTime(0))
    mem.addData(b0: _*)
    q.processAllAvailable()
    mem.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    val got = Rollup.finalized(Rollup.read(spark, store), spec)
      .collect().map(_.toSeq).toSet
    val want = Rollup.finalized(
      Rollup.state((b0 ++ b1).toDF("k", "x"), spec), spec)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.size === 3)
  }

  test("re-delivered micro-batch is a no-op; foreign tokens are not") {
    val store = tmp("rs-redeliver") + "/rollup"
    val tok = RollupStream.appToken("ckpt-A")
    val batch = b0.toDF("k", "x")

    RollupStream.foldBatch(spark, batch, 0L, store, spec, tok)
    val after1 = Rollup.read(spark, store).collect().map(_.toSeq).toSet

    // crash-and-re-deliver: same token, same batch id — must not fold
    RollupStream.foldBatch(spark, batch, 0L, store, spec, tok)
    assert(Rollup.read(spark, store).collect().map(_.toSeq).toSet === after1)

    // a LATER batch from the same stream folds
    RollupStream.foldBatch(spark, b1.toDF("k", "x"), 1L, store, spec, tok)
    val after2 = Rollup.finalized(Rollup.read(spark, store), spec)
      .collect().map(_.toSeq).toSet
    assert(after2 === Rollup.finalized(
      Rollup.state((b0 ++ b1).toDF("k", "x"), spec), spec)
      .collect().map(_.toSeq).toSet)

    // a different stream (new checkpoint ⇒ new token) restarting at
    // batch 0 must NOT be mistaken for our re-delivery
    val tok2 = RollupStream.appToken("ckpt-B")
    RollupStream.foldBatch(spark, Seq(("d", 1.0)).toDF("k", "x"),
      0L, store, spec, tok2)
    val keys = Rollup.read(spark, store).select("k")
      .as[String].collect().toSet
    assert(keys === Set("a", "b", "c", "d"))
  }
}
