package graft

import org.apache.spark.sql.functions.col

/** Operator-owned persists must not outlive their query (round-3
  * review): running persist-bearing queries back-to-back WITHOUT
  * clearCache must leave the session's CacheManager empty after each —
  * the Caches.releaseAfterUse listener, not the caller, closes the
  * lifecycle. (Bench/Verify still clearCache defensively; a long-lived
  * user session is the case this protects.) */
class CacheLifecycleSpec extends SparkSpec {

  private def runNoop(name: String): Unit =
    SparkEntry.queries(name)(spark, sf0001)
      .write.format("noop").mode("overwrite").save()

  /** The release listener fires on the async listener bus — poll. */
  private def awaitEmpty(after: String): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (!spark.sharedState.cacheManager.isEmpty &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.sharedState.cacheManager.isEmpty,
      s"cached blocks leaked past $after")
  }

  test("dedup/similarity/text persists release after each query, no clearCache") {
    spark.catalog.clearCache() // isolate from other suites' state
    // every operator family that owns a persist: minhash signatures,
    // simhash signatures, jaccard shingle sets, embedding vectors,
    // tokenized bases (q84/q86/q79/q76)
    for (q <- Seq("q20_minhash", "q21_simhash", "q22_jaccard",
        "q25_embed_neardup", "q84_bigram_surprisal", "q86_pipeline_report",
        "q79_repetition", "q76_contamination")) {
      runNoop(q)
      awaitEmpty(q)
    }
  }

  test("abandoned persist expires after enough unrelated events (no permanent leak)") {
    spark.catalog.clearCache()
    import spark.implicits._
    import graft.operators.Caches
    // register a release-after-use persist, then NEVER run the returned
    // plan — the match event the listener waits for will never arrive
    val abandoned = Caches.releaseAfterUse(
      (1 to 100).toDF("n").select(col("n") * 2 as "m"), expiryEvents = 5)
    abandoned.count() // materialize the cache entry (this IS a match...)
    // re-register with a fresh plan that is then abandoned for real
    val orphan = Caches.releaseAfterUse(
      (1 to 50).toDF("k").select(col("k") + 7 as "j"), expiryEvents = 5)
    orphan.queryExecution.analyzed // force construction, run nothing
    // drive unrelated actions past the expiry threshold
    for (_ <- 1 to 8) (1 to 3).toDF("x").write.format("noop")
      .mode("overwrite").save()
    awaitEmpty("abandoned releaseAfterUse persists")
  }

  test("trained-quantizer internal persists release inside the call") {
    spark.catalog.clearCache()
    // ivfTopKTrained/pqTopKTrained persist across their own training
    // actions and release via try/finally before returning the (lazy)
    // search plan — empty as soon as the query action completes
    runNoop("q71_ann_ivf_trained")
    awaitEmpty("q71_ann_ivf_trained")
  }
}
