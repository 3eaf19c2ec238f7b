package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity
import graft.streaming.AnnIngestStream

/** Dev measurement (not part of the driver contract): a LONG routed
  * ingest through the REAL stream — `ingestRouted` + AutoRecalibrate —
  * measuring sustained throughput and the advisory/recalibration
  * timeline the closed loops produce as the store grows past its
  * calibrated size. The hash-sharded ingest has a measured number;
  * this gives the routed path its own (r11 task 7).
  *
  * Usage: runMain graft.tools.RoutedSoak [batches] [batchSize]
  * Seeds a routed store (20k vectors, 16 clusters, 4 shards, trained
  * super, both layers calibrated), then streams `batches` × `batchSize`
  * new vectors through `ingestRouted` (adviseEvery = 5, auto
  * recalibration on both layers). Prints one JSON line: rec/s, wall,
  * per-batch percentiles, and every routing advisory with its trip
  * state — the store grows ~3.5×, so the ≥2× growth advisory MUST trip
  * mid-soak and the loop must close it.
  */
object RoutedSoak {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(20)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(2500)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dim = 32
    val clusters = 16
    val rnd = new scala.util.Random(42)
    val centers = Seq.fill(clusters)(Array.fill(dim)(rnd.nextGaussian()))
    def vecsAt(from: Int, n: Int): Seq[(Long, Seq[Double])] =
      (from until from + n).map { i =>
        val c = centers(i % clusters)
        (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
      }

    val seedN = 20000
    val store = java.nio.file.Files.createTempDirectory("routedsoak")
      .toString + "/store"
    val seed = vecsAt(0, seedN).toDF("vec_id", "embedding")
    Similarity.buildRoutedIvfStore(seed, store, shards = 4, nlist = 0,
      iters = 0, dim = dim, superIters = 3)
    val queries = seed.filter(col("vec_id") < 32)
    Similarity.calibrateShardedIvfStore(spark, store, queries, k = 10,
      targetRecall = 0.9)
    Similarity.calibrateRoutedIvfStore(spark, store, queries, k = 10,
      targetRecall = 0.9)

    val advisories = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Option[Int], Boolean)]
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = AnnIngestStream.ingestRouted(
      mem.toDF().toDF("vec_id", "embedding"), store,
      checkpoint = java.nio.file.Files
        .createTempDirectory("routedsoak-ckpt").toString,
      compactEvery = 10, adviseEvery = 5,
      onRoutingAdvice = a => advisories.synchronized {
        advisories += ((a.batchId, a.nItems, a.routeShards,
          a.recalibrateAdvised)); ()
      },
      trigger = Trigger.ProcessingTime(0),
      recalibrate = Some(AnnIngestStream.AutoRecalibrate(
        queries, k = 10, targetRecall = 0.9)))
    val batchWalls = Seq.newBuilder[Double]
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val tb = System.nanoTime()
      mem.addData(vecsAt(seedN + b * batchSize, batchSize): _*)
      q.processAllAvailable()
      batchWalls += (System.nanoTime() - tb) / 1e9
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()

    val total = batches.toLong * batchSize
    val stored = Similarity.routedStoreAdvice(spark, store)
      .head().getAs[Long]("n_items")
    // post-soak: the loop must have left the calibration CURRENT
    // (advisory not tripped) and the store exactly seed + streamed
    val finalAdv = Similarity.routedStoreAdvice(spark, store).head()
    val walls = batchWalls.result().sorted
    def pct(p: Double) = walls((p * (walls.size - 1)).round.toInt)
    val tl = advisories.synchronized { advisories.toSeq }
      .map { case (b, n, d, trip) =>
        s"""{"batch":$b,"n_items":$n,"route_shards":${d.getOrElse(-1)},""" +
          s""""recalibrate_advised":$trip}""" }
      .mkString("[", ",", "]")
    println(s"""{"seed":$seedN,"batches":$batches,"batch_size":$batchSize,""" +
      s""""streamed":$total,"stored":$stored,""" +
      f""""wall_sec":$wall%.1f,"rec_per_sec":${total / wall}%.0f,""" +
      f""""batch_p50_sec":${pct(0.5)}%.2f,"batch_p95_sec":${pct(0.95)}%.2f,""" +
      s""""final_recalibrate_advised":${
        finalAdv.getAs[Boolean]("recalibrate_advised")},""" +
      s""""advisories":$tl}""")
    spark.stop()
  }
}
