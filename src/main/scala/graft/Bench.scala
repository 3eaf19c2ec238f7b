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
      // cap generated-method size at the JVM JIT HugeMethodLimit: a
      // whole-stage method past 8 KB bytecode is NEVER JIT-compiled
      // (runs in the bytecode interpreter), so Spark's 65535 default
      // silently trades compiled-but-interpreted for the faster
      // non-codegen fallback — measured 11x on the PQ-encode stage
      // (SCALING.md round-9)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
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
    // SPARK_GRAFT_QUERIES=q20_minhash,q64_dedup_clusters restricts the
    // sweep (scale-curvature runs bench only the heavy families at sf1);
    // unset = full suite. SPARK_GRAFT_BENCH_OUT redirects the full-map
    // file (default BENCH_FULL.json) so a subset run cannot clobber the
    // official full-suite record.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a subset run defaults to its OWN file — only a full-suite run may
    // write BENCH_FULL.json unasked (a partial map silently replacing
    // the official full-suite record was exactly the clobber this
    // redirect exists to prevent)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (subset.isDefined) "BENCH_SUBSET.json" else "BENCH_FULL.json")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    // a failing query must be VISIBLE, not a ~0s "fast" sample: the
    // swallow keeps the sweep alive (one broken query must not zero the
    // whole bench), but its name is recorded and reported — a bench
    // where q_x silently stopped executing would otherwise read as a
    // q_x speedup
    val failed = scala.collection.mutable.Set.empty[String]
    // a failed attempt's time-to-throw is NOT a sample: a query that
    // starts failing fast must neither shrink `total` nor report a
    // misleading per-query "time" — it returns NaN (rendered null in
    // the passes record) and is excluded from results/total below,
    // surviving only in the errors list
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true }
        catch { case _: Throwable => failed += name; false }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) t else Double.NaN
    }
    val pass1 = names.map { case (name, fn) => name -> once(name, fn) }.toMap
    val pass2 = names.map { case (name, fn) => name -> once(name, fn) }.toMap
    // Third sweep membership (r6 verdict): queries whose two samples
    // disagree by >1.5x (noise suspected) PLUS every query whose best
    // sample is >=2s — the expensive families are exactly where a
    // load-inflated min misleads the baseline comparison most, so they
    // always get three sweep-separated chances.
    val noisy = names.filter { case (name, _) =>
      val (a, b) = (pass1(name), pass2(name))
      !failed(name) &&
        (math.max(a, b) / math.min(a, b) > 1.5 || math.min(a, b) >= 2.0)
    }
    val pass3 = noisy.map { case (name, fn) => name -> once(name, fn) }.toMap
    def samples(name: String): Seq[Double] =
      (Seq(pass1(name), pass2(name)) ++ pass3.get(name)).filterNot(_.isNaN)
    // failed queries (any attempt threw) contribute no result row at
    // all — a partially-failing query's surviving samples are not
    // trustworthy either (its plan changed state mid-sweep)
    val results = names.collect {
      case (name, _) if !failed(name) => name -> samples(name).min }
    // load_suspect: after all sweeps the samples STILL spread >1.5x.
    // The min is reported either way (it is the best lower bound on the
    // plan's cost), but the flag tells the consumer that ambient load
    // touched this query in at least one sweep — distinguishing "noisy
    // environment" from "genuinely slow plan" without a re-run.
    val loadSuspect = names.collect { case (name, _)
      if !failed(name) && samples(name).max / samples(name).min > 1.5 => name }
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
          .map(v => if (v.isNaN) "null" else f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val suspectJson = loadSuspect.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errorsJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(headline)},"errors":$errorsJson,"sf":"$sfDir"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(results)},"passes":$passes,"load_suspect":$suspectJson,"errors":$errorsJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
