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
    val tok = RollupStream.appToken(spark, "ckpt-A")
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
    val tok2 = RollupStream.appToken(spark, "ckpt-B")
    RollupStream.foldBatch(spark, Seq(("d", 1.0)).toDF("k", "x"),
      0L, store, spec, tok2)
    val keys = Rollup.read(spark, store).select("k")
      .as[String].collect().toSet
    assert(keys === Set("a", "b", "c", "d"))
  }

  test("re-delivery guard survives an interleaved writer's commit") {
    val store = tmp("rs-interleave") + "/rollup"
    val tok = RollupStream.appToken(spark, "ckpt-IL")
    RollupStream.foldBatch(spark, b0.toDF("k", "x"), 0L, store, spec, tok)
    // crash window: before the restart re-delivers batch 0, ANOTHER
    // writer commits to the same store (a manual untagged backfill) —
    // the stream's tag moves off the LIVE commit, but must still be
    // found among the retained commits or the re-delivery double-counts
    Rollup.fold(spark, store, Seq(("z", 5.0)).toDF("k", "x"), spec)
    val before = Rollup.finalized(Rollup.read(spark, store), spec)
      .collect().map(_.toSeq).toSet
    RollupStream.foldBatch(spark, b0.toDF("k", "x"), 0L, store, spec, tok)
    assert(Rollup.finalized(Rollup.read(spark, store), spec)
      .collect().map(_.toSeq).toSet === before)
  }

  test("a wiped-and-reused checkpoint path mints a fresh token") {
    val ckpt = tmp("rs-wipe")
    val dir = new java.io.File(ckpt)
    def writeMeta(id: String): Unit = {
      dir.mkdirs()
      Files.write(java.nio.file.Paths.get(ckpt, "metadata"),
        s"""{"id":"$id"}""".getBytes("UTF-8"))
    }
    // first life of the checkpoint
    writeMeta("11111111-aaaa-bbbb-cccc-222222222222")
    val tok1 = RollupStream.appToken(spark, ckpt)
    // restart from the SAME checkpoint: same token (re-delivery works)
    assert(RollupStream.appToken(spark, ckpt) === tok1)

    // wipe + recreate at the same path: Spark writes a new query id,
    // so the token must change — batch 0 of the new stream may not be
    // mistaken for the old stream's re-delivery
    Files.delete(java.nio.file.Paths.get(ckpt, "metadata"))
    writeMeta("33333333-dddd-eeee-ffff-444444444444")
    val tok2 = RollupStream.appToken(spark, ckpt)
    assert(tok2 !== tok1)

    // and the aliasing scenario end-to-end: old stream folded batch 1,
    // new stream's batch 0 must still fold
    val store = tmp("rs-wipe-store") + "/rollup"
    RollupStream.foldBatch(spark, b0.toDF("k", "x"), 1L, store, spec, tok1)
    RollupStream.foldBatch(spark, Seq(("z", 5.0)).toDF("k", "x"),
      0L, store, spec, tok2)
    val keys = Rollup.read(spark, store).select("k")
      .as[String].collect().toSet
    assert(keys === Set("a", "b", "z"))
  }
}
