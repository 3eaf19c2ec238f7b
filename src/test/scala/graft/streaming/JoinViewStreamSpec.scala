package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.JoinView

/** The streaming fact folds must equal the batch fold sequence over
  * the same batches — and a dim update landing between micro-batches
  * is picked up by the NEXT batch (per-batch dim evaluation). */
class JoinViewStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streaming folds equal batch folds; dim re-evaluates per batch") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("jvs-store") + "/view"
    val dimDir = tmp("jvs-dim")
    val spec = JoinView.Spec(factKey = "fid", dimKey = "dkey")

    Seq((10L, "a"), (20L, "b")).toDF("dkey", "dname")
      .write.mode("overwrite").parquet(dimDir)

    val mem = MemoryStream[(Long, Long, Double)]
    // dim passed BY NAME: re-read per micro-batch
    val q = JoinViewStream.maintain(mem.toDF().toDF("fid", "dkey", "v"),
      store, spark.read.parquet(dimDir), spec,
      checkpoint = tmp("jvs-ckpt"), trigger = Trigger.ProcessingTime(0))
    mem.addData((1L, 10L, 1.0), (2L, 20L, 2.0))
    q.processAllAvailable()

    // dim update lands between micro-batches
    Seq((10L, "a2"), (20L, "b")).toDF("dkey", "dname")
      .write.mode("overwrite").parquet(dimDir)
    mem.addData((3L, 10L, 3.0))
    q.processAllAvailable()
    q.stop()

    val got = JoinView.read(spark, store)
      .select("fid", "dkey", "v", "dname")
      .as[(Long, Long, Double, String)].collect().toSet
    // batch-1 rows carry the OLD dim values (folded before the
    // update); the batch-2 row carries the new one — exactly the
    // as-of-fold contract (foldDim is the tool to re-enrich history)
    assert(got === Set((1L, 10L, 1.0, "a"), (2L, 20L, 2.0, "b"),
      (3L, 10L, 3.0, "a2")))

    // and foldDim re-enriches the history on demand
    JoinView.foldDim(spark, store,
      Seq((10L, "a2")).toDF("dkey", "dname"), spec)
    assert(JoinView.read(spark, store)
      .select("fid", "dkey", "v", "dname")
      .as[(Long, Long, Double, String)].collect().toSet ===
      Set((1L, 10L, 1.0, "a2"), (2L, 20L, 2.0, "b"),
        (3L, 10L, 3.0, "a2")))
  }
}
