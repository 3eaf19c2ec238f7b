package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (not part of the driver contract): the probed-SHARD
  * share and wall-clock of the ROUTED sharded search vs the exhaustive
  * all-shards merge — the numbers behind SCALING.md's "sharding
  * becomes a per-query cost lever" claim, and its honest boundary:
  * routing's win is CORPUS-DEPENDENT. On a clustered corpus the
  * calibrated route depth lands ≪ shards; on a uniform corpus the
  * calibration measures that no depth short of all shards meets the
  * target and chooses share 1 (exhaustive) — the correct operating
  * point, not a regression.
  *
  * Usage: runMain graft.tools.RoutedShare <sfDir|synth:N:clusters> ...
  * For each corpus: build a routed store (4 shards, trained super),
  * calibrate per-shard nprobe and the route depth (target 0.9), then
  * time + recall the calibrated routed search vs all-shards (both
  * consuming the same per-shard nprobe calibration), vs brute truth.
  * One JSON line per corpus. */
object RoutedShare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def synth(n: Int, clusters: Int, dim: Int = 32): DataFrame = {
      val rnd = new scala.util.Random(42)
      val centers = Seq.fill(clusters)(
        Array.fill(dim)(rnd.nextGaussian()))
      (0 until n).map { i =>
        val c = centers(i % clusters)
        (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
      }.toDF("vec_id", "embedding")
    }

    args.foreach { spec =>
      val (label, corpus, dim) =
        if (spec.startsWith("synth:")) {
          val Array(_, n, c) = spec.split(":")
          (spec, synth(n.toInt, c.toInt), 32)
        } else (spec, graft.sources.Tables.load(spark, spec, "embeddings"), 64)
      val n = corpus.count()
      val shards = 4
      val store = java.nio.file.Files.createTempDirectory("routedshare")
        .toString + "/store"
      val S = graft.operators.Similarity
      S.buildRoutedIvfStore(corpus, store, shards = shards, nlist = 0,
        iters = 0, dim = dim, superIters = 3)
      val queries = corpus.filter(col("vec_id") < 32)
      S.calibrateShardedIvfStore(spark, store, queries, k = 10,
        targetRecall = 0.9)
      val depth = S.calibrateRoutedIvfStore(spark, store, queries, k = 10,
        targetRecall = 0.9)
      val truth = S.bruteForceTopK(corpus, queries, k = 10)
        .select("query_id", "item_id").as[(Long, Long)].collect().toSet
      def measure(routeShards: Int): (Double, Double) = {
        // min-of-3 wall on the materialized count, recall once
        val times = (0 until 3).map { _ =>
          val t0 = System.nanoTime()
          S.searchRoutedIvfStore(spark, queries, store, k = 10,
            nprobe = 0, routeShards = routeShards).count()
          (System.nanoTime() - t0) / 1e9
        }
        val got = S.searchRoutedIvfStore(spark, queries, store, k = 10,
            nprobe = 0, routeShards = routeShards)
          .select("query_id", "item_id").as[(Long, Long)].collect().toSet
        (times.min, got.intersect(truth).size.toDouble / truth.size)
      }
      val (tAll, rAll) = measure(shards)
      val (tRouted, rRouted) = measure(0) // calibrated depth
      // cluster shards can skew — record it: probed WORK per query is
      // share × (balance-weighted) corpus, so imbalance qualifies the
      // share as a cost claim
      val sizes = (0 until shards).map { i =>
        val p = new org.apache.hadoop.fs.Path(s"$store/shard=$i/encoded")
        if (p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(p)) spark.read.parquet(p.toString).count() else 0L
      }
      val imbalance = sizes.max.toDouble / (sizes.sum.toDouble / shards)
      println(s"""{"corpus":"$label","n":$n,"shards":$shards,""" +
        s""""route_depth":$depth,"share":${depth.toDouble / shards},""" +
        f""""imbalance":$imbalance%.2f,""" +
        f""""routed_sec":$tRouted%.3f,"all_sec":$tAll%.3f,""" +
        f""""routed_recall":$rRouted%.4f,"all_recall":$rAll%.4f}""")
    }
    spark.stop()
  }
}
