package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev scratch profiler (not part of the driver contract).
  * Usage: runMain graft.tools.Profile <queryName> [queryName…] */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // cap generated-method size at the JVM JIT HugeMethodLimit: a
      // whole-stage method past 8 KB bytecode is NEVER JIT-compiled
      // (runs in the bytecode interpreter), so Spark's 65535 default
      // silently trades compiled-but-interpreted for the faster
      // non-codegen fallback — measured 11x on the PQ-encode stage
      // (SCALING.md round-9)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // PROFILE_FRESH=1 rebuilds the DataFrame each run (Bench's shape —
    // exercises CacheManager plan-match reuse rather than same-object reuse).
    val fresh = sys.env.contains("PROFILE_FRESH")
    // cumulative shuffle-write bytes across all tasks — the wire-cost
    // readout SCALING.md's shuffle claims quote (listener delivery is
    // async; the short settle sleep below keeps per-run deltas honest
    // for a dev tool)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val outputBytes = new java.util.concurrent.atomic.AtomicLong
    // PROFILE_JOBS=1: per-job wall time + description — the job-FLOOR
    // readout for the lifecycle queries, whose cost is #driver-actions
    // × (schedule + tiny-stage) rather than data volume.
    val traceJobs = sys.env.contains("PROFILE_JOBS")
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            outputBytes.addAndGet(m.outputMetrics.bytesWritten)
          }
          ()
        }
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet()
          if (traceJobs) {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty(
                "spark.job.description"))).getOrElse("")
            val call = Option(js.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("")
            jobStart.put(js.jobId,
              (System.nanoTime(), if (desc.nonEmpty) desc else call))
          }
          ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (traceJobs) Option(jobStart.remove(je.jobId)).foreach {
            case (t0, what) =>
              val ms = (System.nanoTime() - t0) / 1e6
              println(f"    job ${je.jobId}%4d ${ms}%9.1f ms  $what")
          }
          ()
        }
      })
    args.foreach { name =>
      // in FRESH mode construct lazily inside each run (Bench's exact
      // shape): a pre-constructed lifecycle query leaves cached plan
      // fragments whose files the fresh re-run's own lifecycle
      // rebuilds/swaps — CacheManager plan-matching then feeds the new
      // plan dead file listings (FILE_NOT_EXIST on the sig-store
      // compact swap; Bench never holds two constructions at once)
      val wantInspect = sys.env.contains("PROFILE_EXPLAIN") ||
        sys.env.contains("PROFILE_SHOW")
      val df = if (fresh && !wantInspect) null
        else SparkEntry.queries(name)(spark, dir)
      if (sys.env.contains("PROFILE_EXPLAIN")) df.explain("formatted")
      if (sys.env.contains("PROFILE_SHOW")) df.show(50, truncate = false)
      if (fresh && wantInspect) spark.catalog.clearCache()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val s0 = shuffleBytes.get()
        val o0 = outputBytes.get()
        val j0 = jobCount.get()
        val d = if (fresh) SparkEntry.queries(name)(spark, dir) else df
        val tBuild = (System.nanoTime() - t0) / 1e9
        d.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        // match Bench's per-run cache discipline: a lifecycle query
        // re-run in one JVM otherwise reads a prior run's listings
        // against its rename-swapped store (FILE_NOT_EXIST)
        spark.catalog.clearCache()
        Thread.sleep(500) // let the listener bus drain
        val sb = (shuffleBytes.get() - s0) / 1e6
        val ob = (outputBytes.get() - o0) / 1e6
        val jn = jobCount.get() - j0
        println(f"$name run$i: $t%8.2f s (build $tBuild%.2f)" +
          f"  jobs $jn%4d  shuffle-write $sb%10.2f MB" +
          f"  output-write $ob%10.2f MB")
      }
    }
    spark.stop()
  }
}
