package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (not part of the driver contract): the cost and
  * effect of [[graft.operators.Similarity.splitHotShard]] vs the only
  * prior skew remedy — a full [[buildRoutedIvfStore]] rebuild. For
  * each corpus spec: build a routed store, record the shard imbalance
  * (max/mean stored count), time ONE hot-shard split, record the new
  * imbalance and verify exhaustive-search equivalence on a query
  * sample, then time a full rebuild of the same corpus into a fresh
  * dir for the cost comparison. One JSON line per corpus.
  *
  * Usage: runMain graft.tools.SplitCost <sfDir|synth:N:clusters> ...
  * `synth:N:C` draws N vectors around C Gaussian cluster centers with
  * a zipf-ish skew (cluster c gets weight 1/(c+1)) — the hot-shard
  * shape the split exists for.
  */
object SplitCost {
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
      // zipf-ish cluster weights: cluster c ∝ 1/(c+1) — the skewed
      // membership that creates a hot shard
      val w = Array.tabulate(clusters)(c => 1.0 / (c + 1))
      val cum = w.scanLeft(0.0)(_ + _).tail.map(_ / w.sum)
      (0 until n).map { i =>
        val u = ((i * 2654435761L) % 1000003).toDouble / 1000003
        val c = cum.indexWhere(u <= _) match { case -1 => clusters - 1; case x => x }
        (i.toLong, centers(c).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
      }.toDF("vec_id", "embedding")
    }

    args.foreach { spec =>
      val (label, corpus, dim) =
        if (spec.startsWith("synth:")) {
          val Array(_, n, c) = spec.split(":")
          (spec, synth(n.toInt, c.toInt), 32)
        } else (spec, graft.sources.Tables.load(spark, spec, "embeddings"), 64)
      val cached = corpus.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = cached.count()
      val shards = 4
      val store = java.nio.file.Files.createTempDirectory("splitcost")
        .toString + "/store"
      val S = graft.operators.Similarity
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (_, buildSec) = time(S.buildRoutedIvfStore(cached, store,
        shards = shards, nlist = 0, iters = 0, dim = dim, superIters = 3))
      def sizes(k: Int): Seq[Long] = (0 until k).map { i =>
        val p = new org.apache.hadoop.fs.Path(s"$store/shard=$i/encoded")
        if (p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(p)) spark.read.parquet(p.toString).count() else 0L
      }
      val before = sizes(shards)
      val queries = cached.filter(col("vec_id") < 16)
      // equivalence must compare the EXACT configuration on both
      // sides: full route depth + exhaustive per-shard probes (nprobe
      // past every shard's nlist) — nprobe=0 would resolve to each
      // quantizer's own approximate operating point, which legitimately
      // differs across quantizers
      val preSearch = S.searchRoutedIvfStore(spark, queries, store,
          k = 10, nprobe = 1 << 20, routeShards = shards)
        .select("query_id", "item_id").as[(Long, Long)].collect().toSet
      // repeated splits: the first on a MIXED hot shard tends to peel
      // its minority cluster (2-means' local optimum), later ones
      // bisect the dominant mass — record the hot-SHARE trajectory
      // (the tail-latency driver), not max/mean, which is misleading
      // across changing shard counts
      var sh = shards
      val hotShares = Seq.newBuilder[Double]
      hotShares += before.max.toDouble / before.sum
      val splitSecs = Seq.newBuilder[Double]
      (0 until 3).foreach { _ =>
        val (k, s) = time(S.splitHotShard(spark, store, splitIters = 3))
        sh = k; splitSecs += s
        val sz = sizes(sh)
        hotShares += sz.max.toDouble / sz.sum
      }
      val postSearch = S.searchRoutedIvfStore(spark, queries, store,
          k = 10, nprobe = 1 << 20, routeShards = sh)
        .select("query_id", "item_id").as[(Long, Long)].collect().toSet
      val equiv = preSearch == postSearch
      // the displaced rival: a full rebuild (fresh dir, same params)
      val store2 = java.nio.file.Files.createTempDirectory("splitcost2")
        .toString + "/store"
      val (_, rebuildSec) = time(S.buildRoutedIvfStore(cached, store2,
        shards = shards, nlist = 0, iters = 0, dim = dim, superIters = 3))
      cached.unpersist(blocking = false)
      println(s"""{"corpus":"$label","n":$n,"shards_start":$shards,""" +
        s""""shards_end":$sh,""" +
        s""""hot_share_trajectory":[${hotShares.result()
          .map("%.3f".format(_)).mkString(",")}],""" +
        s""""split_secs":[${splitSecs.result()
          .map("%.2f".format(_)).mkString(",")}],""" +
        f""""rebuild_sec":$rebuildSec%.2f,"build_sec":$buildSec%.2f,""" +
        s""""exhaustive_equiv":$equiv}""")
    }
    spark.stop()
  }
}
