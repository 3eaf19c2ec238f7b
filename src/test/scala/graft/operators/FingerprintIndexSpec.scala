package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The daily-crawl loop: build the standing index once, admit each new
  * batch against it, fold the admitted docs back in with append — and
  * the index only ever grows by NEW fingerprints. */
class FingerprintIndexSpec extends SparkSpec {
  import spark.implicits._

  test("build → admit → append models the daily-crawl loop") {
    val idx = java.nio.file.Files.createTempDirectory("fpidx").toString + "/idx"
    val day0 = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    FingerprintIndex.build(day0, idx)
    // day 1: 3 duplicates history, 4/5 duplicate each other, 6 is fresh
    val day1 = Seq(
      (3L, "alpha beta gamma delta"),
      (4L, "five six seven eight"),
      (5L, "five six seven eight"),
      (6L, "nine ten eleven twelve")).toDF("doc_id", "text")
    val a1 = FingerprintIndex.admit(spark, day1, idx)
      .as[(Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(a1.map(r => (r._1, r._3, r._4)).toSeq === Seq(
      (3L, true, false),   // dup_of_history
      (4L, false, false),  // first of the in-batch pair wins
      (5L, false, true),   // dup_in_batch
      (6L, false, false)))
    // fold the admitted docs in; the same texts are history dups tomorrow
    val keep = day1.filter(col("doc_id").isin(4L, 6L))
    FingerprintIndex.append(spark, keep, idx)
    val day2 = Seq(
      (7L, "five six seven eight"),
      (8L, "nine ten eleven twelve"),
      (9L, "fresh text entirely new")).toDF("doc_id", "text")
    val a2 = FingerprintIndex.admit(spark, day2, idx)
      .as[(Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(a2.map(r => (r._1, r._3)).toSeq ===
      Seq((7L, true), (8L, true), (9L, false)))
    // append is anti-joined: re-appending the same docs adds nothing
    val n1 = spark.read.parquet(idx).count()
    FingerprintIndex.append(spark, keep, idx)
    assert(spark.read.parquet(idx).count() === n1)
  }

  test("bucketed index: only the batch side shuffles in the admission join") {
    val corpus = (1L to 400L)
      .map(i => (i, s"corpus doc number $i with its own words ${i * 7}"))
      .toDF("doc_id", "text")
    FingerprintIndex.buildBucketed(corpus, "fp_idx_bkt", buckets = 8)
    try {
      val batch = Seq(
        (1001L, "corpus doc number 5 with its own words 35"), // history dup
        (1002L, "a genuinely new document"),
        (1003L, "a genuinely new document")) // in-batch dup
        .toDF("doc_id", "text")
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val admitted = FingerprintIndex.admitBucketed(spark, batch, "fp_idx_bkt")
        val p = admitted.queryExecution.executedPlan.toString
        // the index scan reuses its write-time bucket layout…
        assert(p.contains("Bucketed: true"), p)
        // …so the whole plan carries ONE hash exchange: the day-sized
        // batch moving into the index's buckets (the join's output is
        // already fp-partitioned, so the fp window adds none). The
        // unbucketed admit pays two.
        val exchanges = p.linesIterator
          .count(_.contains("Exchange hashpartitioning"))
        assert(exchanges === 1, p)
        val rows = admitted.as[(Long, Long, Boolean, Boolean)]
          .collect().sortBy(_._1)
        assert(rows.map(r => (r._1, r._3, r._4)).toSeq === Seq(
          (1001L, true, false), (1002L, false, false), (1003L, false, true)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      // daily maintenance folds in without a rebuild: after appending
      // the admitted doc, the same text is a history dup tomorrow
      val n0 = spark.table("fp_idx_bkt").count()
      FingerprintIndex.appendBucketed(spark,
        batch.filter(col("doc_id") === 1002L), "fp_idx_bkt")
      assert(spark.table("fp_idx_bkt").count() === n0 + 1)
      val day2 = Seq((2001L, "a genuinely new document")).toDF("doc_id", "text")
      val a2 = FingerprintIndex.admitBucketed(spark, day2, "fp_idx_bkt")
        .as[(Long, Long, Boolean, Boolean)].collect()
      assert(a2.map(r => (r._1, r._3)).toSeq === Seq((2001L, true)))
      // re-append adds nothing (anti-joined), bucket layout intact
      FingerprintIndex.appendBucketed(spark,
        batch.filter(col("doc_id") === 1002L), "fp_idx_bkt")
      assert(spark.table("fp_idx_bkt").count() === n0 + 1)
    } finally spark.sql("DROP TABLE IF EXISTS fp_idx_bkt")
  }
}
