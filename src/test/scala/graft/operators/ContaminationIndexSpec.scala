package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The materialized eval-shingle index must make the contamination
  * check equal to the from-scratch q76-style computation, and appends
  * must be idempotent and delta-only. */
class ContaminationIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/idx"

  private val bench = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "one two three four five six seven"))
  private val corpus = Seq(
    // full 5-gram overlap with bench 0
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    // clean
    (11L, "nothing here matches any benchmark shingle at all today"),
    // short doc: fewer than n tokens → zero shingles, 0.0 ratio
    (12L, "tiny doc"))

  test("check against the index ≡ from-scratch bench-shingle semi join") {
    val idx = tmp("ci")
    ContaminationIndex.build(spark, idx, bench.toDF("id", "text"), "text", 5)

    val got = ContaminationIndex.check(spark,
        corpus.toDF("doc_id", "text"), "doc_id", "text", idx, 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

    // doc 10: 4 distinct 5-grams, all hits; 11: 9 tokens → 5 shingles,
    // 0 hits; 12: 0 shingles → ratio 0.0 (not null, not NaN)
    assert(got === Seq((10L, 4L, 4L, 1.0), (11L, 5L, 0L, 0.0),
      (12L, 0L, 0L, 0.0)))
  }

  test("append is delta-only and idempotent") {
    val idx = tmp("ci-append")
    ContaminationIndex.build(spark, idx,
      bench.take(1).toDF("id", "text"), "text", 5)
    val n1 = ContaminationIndex.indexSize(spark, idx)
    assert(n1 === 4) // 8 tokens → 4 distinct 5-grams

    // appending the SAME set writes nothing
    ContaminationIndex.append(spark, idx,
      bench.take(1).toDF("id", "text"), "text", 5)
    assert(ContaminationIndex.indexSize(spark, idx) === n1)

    // a new eval set folds in only its unseen shingles
    ContaminationIndex.append(spark, idx,
      bench.toDF("id", "text"), "text", 5)
    val n2 = ContaminationIndex.indexSize(spark, idx)
    assert(n2 === 7) // + 3 distinct 5-grams from bench 1
    // distinctness holds after append
    assert(spark.read.parquet(idx).distinct().count() === n2)
  }

  test("check tolerates duplicate index rows (racing appends converge, never double-count)") {
    // two concurrent append()s can both pass the anti-join and write
    // the same shingles — the index then holds duplicates. That must
    // be INVISIBLE to check(): the hit probe is a LEFT SEMI join, so a
    // shingle matches at most once per doc no matter how many index
    // copies exist. This pins the semi-join choice — an inner join
    // here would silently double n_hit.
    val idx = tmp("ci-dup")
    ContaminationIndex.build(spark, idx, bench.toDF("id", "text"), "text", 5)
    val clean = ContaminationIndex.check(spark,
        corpus.toDF("doc_id", "text"), "doc_id", "text", idx, 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // duplicate EVERY index row (worst-case racing-append debris)
    spark.read.parquet(idx).write.mode("append").parquet(idx)
    assert(spark.read.parquet(idx).count() ===
      spark.read.parquet(idx).distinct().count() * 2)
    val dup = ContaminationIndex.check(spark,
        corpus.toDF("doc_id", "text"), "doc_id", "text", idx, 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(dup === clean)
  }

  test("index is broadcast in the check plan (no index-side shuffle)") {
    val idx = tmp("ci-plan")
    ContaminationIndex.build(spark, idx, bench.toDF("id", "text"), "text", 5)
    val plan = ContaminationIndex.check(spark,
        corpus.toDF("doc_id", "text"), "doc_id", "text", idx, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
