package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{name:sec,…}}. A warm-up
  * pass (q01) initializes codegen/parquet-footer caches so per-query
  * numbers measure the plan, not JVM warm-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: forces full evaluation of every projected column
    // (count() would let Catalyst prune unused projections and
    // under-report map-only queries).
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try run(SparkEntry.queries("q01_agg")(spark, sfDir)) // JVM warm-up
    catch { case _: Throwable => () }
    // min over INTERLEAVED passes: repetitions of one query are spread
    // across two full sweeps of the whole suite (pass 1 of everything,
    // then pass 2 of everything) instead of run back-to-back. Background
    // load on this machine swings single-shot numbers 3× and arrives in
    // bursts longer than one query — back-to-back min-of-2 put BOTH
    // samples inside the same spike (round 4's q64 read 16.5 s for a
    // 4.3 s plan), while sweep-separated samples land minutes apart, so
    // a burst can inflate one pass but not both and the per-query min
    // cancels it. Queries whose two samples still disagree by >1.5× get
    // a third, taken in its own final sweep. Pass 1 additionally pays
    // codegen compilation; pass 2+ measure steady state. Since round 4,
    // operator-owned persists release at query completion
    // (Caches.releaseAfterUse), so every pass REBUILDS signature/shingle
    // caches — dedup-family numbers are the honest per-run cost (the
    // r2/r3 "fast" numbers measured a cache leaked across runs). Cache
    // is still cleared BETWEEN queries.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir))
      catch { case _: Throwable => () }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    val pass1 = names.map { case (name, fn) => name -> once(fn) }.toMap
    val pass2 = names.map { case (name, fn) => name -> once(fn) }.toMap
    val noisy = names.filter { case (name, _) =>
      val (a, b) = (pass1(name), pass2(name))
      math.max(a, b) / math.min(a, b) > 1.5
    }
    val pass3 = noisy.map { case (name, fn) => name -> once(fn) }.toMap
    val results = names.map { case (name, _) =>
      name -> (Seq(pass1(name), pass2(name)) ++ pass3.get(name)).min
    }
    val total = results.map(_._2).sum
    def render(rs: Seq[(String, Double)]): String = rs.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // the printed line carries the SLOWEST 45 queries only: the consumer
    // keeps a bounded tail of this output, and the full map (~2.4 KB)
    // pushed its own head out of that window. Queries slow in absolute
    // terms — the ones that matter vs the baseline — are always present;
    // a regression that stays under the 45th-slowest time is visible
    // only in BENCH_FULL.json (written to the sbt working dir = repo
    // root under the driver), which records the complete map per run.
    val headline = results.sortBy(-_._2).take(45)
    // per-query pass samples (r5 advice): the full file records every
    // sweep's raw time, not just the min, so the consumer can see
    // VARIANCE — a noisy-looking regression vs a genuinely slow plan
    // are distinguishable without re-running.
    val passes = names.map { case (name, _) =>
      "\"" + name + "\":[" +
        (Seq(pass1(name), pass2(name)) ++ pass3.get(name))
          .map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(headline)},"sf":"$sfDir"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(results)},"passes":$passes,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
