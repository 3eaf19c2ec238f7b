package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Dedup}

/** Dev scratch (not driver contract): replicate the lifecycle queries
  * phase by phase and report wall + job-count per phase — the readout
  * that says WHERE a 300-job query spends its driver actions.
  * Usage: runMain graft.tools.LifecycleProbe q139|q142|q143 */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    // PROBE_CALLSITES=1: per-phase histogram of job call sites (count
    // + summed wall ms) — which driver actions the per-batch job
    // floor is made of, and which of them the wall clock actually
    // goes to (jobs overlap across the prep threads, so the sum can
    // exceed the phase wall; it still ranks the offenders)
    val sites =
      new java.util.concurrent.ConcurrentHashMap[String, (Int, Double)]
    val started =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (sys.env.contains("PROBE_CALLSITES")) {
            // the result stage's name IS the action's short call site
            val call = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            started.put(js.jobId, (System.nanoTime(), call))
          }
          ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(started.remove(je.jobId)).foreach { case (t0, call) =>
            val ms = (System.nanoTime() - t0) / 1e6
            sites.merge(call, (1, ms),
              (a, b) => (a._1 + b._1, a._2 + b._2))
          }
          ()
        }
      })
    def phase[A](name: String)(f: => A): A = {
      Thread.sleep(200)
      sites.clear()
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs ${jobs.get() - j0}%4d")
      if (sys.env.contains("PROBE_CALLSITES")) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2._2).foreach {
          case (k, (n, ms)) => println(f"      $n%4d  ${ms}%8.0f ms  $k")
        }
      }
      r
    }
    def t(s: SparkSession, d: String, n: String) =
      graft.sources.Tables.load(s, d, n)
    val which = args.headOption.getOrElse("q139")

    // PROBE_REPEAT=n: run the lifecycle n times in one JVM — pass 1
    // pays codegen/plan warmup (the bench's pass-1 shape), later
    // passes are the steady state the bench's min-of-3 reports
    val repeats = sys.env.get("PROBE_REPEAT").map(_.toInt).getOrElse(1)
    for (it <- 1 to repeats) {
    println(s"  -- pass $it --")
    which match {
      case "q139" =>
        val store = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_probe139_${System.nanoTime()}").getAbsolutePath
        val e = t(spark, dir, "embeddings")
        phase("buildRoutedIvfStore") {
          Similarity.buildRoutedIvfStore(e.filter(col("vec_id") % 5 =!= 4),
            store, shards = 2, nlist = 4, iters = 0, dim = 64)
        }
        val b1 = e.filter(col("vec_id") % 5 === 4)
            .select(col("vec_id"), col("embedding"),
              lit("I").as("op"), lit(1L).as("seq"))
          .unionByName(e.filter(col("vec_id") % 9 === 2 &&
              col("vec_id") % 2 === 0)
            .select(col("vec_id"), reverse(col("embedding")).as("embedding"),
              lit("U").as("op"), lit(2L).as("seq")))
          .unionByName(e.filter(col("vec_id") % 7 === 1)
            .select(col("vec_id"), col("embedding"),
              lit("D").as("op"), lit(3L).as("seq")))
        phase("applyCdcBatch b1")(Similarity.applyCdcBatch(spark, b1, store))
        val b2 = e.filter(col("vec_id") % 7 === 1 &&
            col("vec_id") % 3 === 0 && col("vec_id") % 2 === 0)
            .select(col("vec_id"), col("embedding"),
              lit("U").as("op"), lit(10L).as("seq"))
          .unionByName(e.filter(col("vec_id") % 13 === 6)
            .select(col("vec_id"), col("embedding"),
              lit("D").as("op"), lit(11L).as("seq")))
        phase("applyCdcBatch b2")(Similarity.applyCdcBatch(spark, b2, store))
        phase("searchRoutedIvfStore") {
          Similarity.searchRoutedIvfStore(spark,
              e.filter(col("vec_id") < 8), store, k = 6, nprobe = 64,
              routeShards = 2)
            .orderBy(col("query_id"), col("rank"))
            .write.format("noop").mode("overwrite").save()
        }
      case "q142" =>
        val table = s"graft_probe142_${System.nanoTime()}"
        val docs = t(spark, dir, "documents")
        val history = docs.filter(col("doc_id") % 3 =!= 0)
        phase("buildSignatureStoreBucketed") {
          Dedup.buildSignatureStoreBucketed(history, "doc_id", "text",
            table, buckets = 4, numHashes = 64, bands = 8, shingleN = 5)
        }
        val rev = concat_ws(" ", reverse(split(col("text"), "\\s+")))
        val b1 = docs.filter(col("doc_id") % 3 === 0)
            .select(col("doc_id"), col("text"), lit("I").as("op"),
              lit(1L).as("seq"))
          .unionByName(history.filter(col("doc_id") % 5 === 1)
            .select(col("doc_id"), rev.as("text"), lit("U").as("op"),
              lit(2L).as("seq")))
          .unionByName(history.filter(col("doc_id") % 7 === 2)
            .select(col("doc_id"), lit(null).cast("string").as("text"),
              lit("D").as("op"), lit(3L).as("seq")))
        phase("applySigCdcBatch b1") {
          Dedup.applySigCdcBatchBucketed(spark, b1, table, buckets = 4,
            numHashes = 64, bands = 8, shingleN = 5)
        }
        val b2 = history
          .filter(col("doc_id") % 7 === 2 && col("doc_id") % 5 === 3)
          .select(col("doc_id"), col("text"), lit("I").as("op"),
            lit(10L).as("seq"))
        phase("applySigCdcBatch b2") {
          Dedup.applySigCdcBatchBucketed(spark, b2, table, buckets = 4,
            numHashes = 64, bands = 8, shingleN = 5)
        }
        val net = docs
          .filter(col("doc_id") % 3 === 0 || col("doc_id") % 7 =!= 2)
          .select(col("doc_id"),
            when(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 1, rev)
              .otherwise(col("text")).as("text"))
        phase("auditSignatureStoreBucketed") {
          Dedup.auditSignatureStoreBucketed(spark, net, "doc_id", "text",
              table, numHashes = 64, bands = 8, shingleN = 5)
            .select(col("id").as("doc_id"), col("sig_ok"), col("bands_ok"))
            .orderBy(col("doc_id"))
            .write.format("noop").mode("overwrite").save()
        }
      case "q136" =>
        val store = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_probe136_${System.nanoTime()}").getAbsolutePath
        val e = t(spark, dir, "embeddings")
        phase("buildRoutedIvfStore") {
          Similarity.buildRoutedIvfStore(e, store, shards = 2, nlist = 4,
            iters = 0, dim = 64)
        }
        phase("delete 1") {
          Similarity.deleteFromShardedIvfStore(spark,
            e.filter(col("vec_id") % 7 === 3).select("vec_id"), store)
        }
        phase("compact x2") {
          (0 until 2).foreach { i =>
            if (new java.io.File(s"$store/shard=$i").exists())
              Similarity.compactIvfStore(spark, s"$store/shard=$i")
          }
        }
        phase("delete 2") {
          Similarity.deleteFromShardedIvfStore(spark,
            e.filter(col("vec_id") % 11 === 5).select("vec_id"), store)
        }
        phase("search") {
          Similarity.searchRoutedIvfStore(spark, e.filter(col("vec_id") < 8),
              store, k = 6, nprobe = 64, routeShards = 2)
            .orderBy(col("query_id"), col("rank"))
            .write.format("noop").mode("overwrite").save()
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.catalog.clearCache()
    }
    spark.stop()
  }
}
