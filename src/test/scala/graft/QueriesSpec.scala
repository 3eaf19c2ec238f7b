package graft

import graft.SparkSpec

/** Smoke: every declared query runs on sf0.001 and (except the genuinely
  * sparse pair-finders at tiny scale) returns rows; entry() is non-empty. */
class QueriesSpec extends SparkSpec {

  // pair-finders may legitimately be empty at sf0.001 (50-500 rows)
  private val mayBeEmpty = Set("q06_anti_join", "q20_minhash", "q21_simhash",
    "q22_jaccard", "q25_embed_neardup",
    "q64_dedup_clusters") // empty exactly when q22's pair finder is

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql without query: $unknown")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q70 stratified sample: every observed stratum present and in-bounds") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q70_stratified_sample")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val full = graft.sources.Tables.load(spark, sf0001, "documents")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every observed stratum survives (nothing silently dropped), its
    // exact population count is reported, and the sampling invariant
    // (kept-whole exact / en within ±6σ of Binomial) holds
    assert(got.keySet === full.keySet)
    full.keySet.foreach { l =>
      assert(got(l)._1 === full(l), s"n_pop mismatch for $l")
      assert(got(l)._2, s"sample_ok false for $l")
    }
  }
}
