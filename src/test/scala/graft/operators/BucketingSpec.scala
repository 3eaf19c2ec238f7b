package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Bucketed layout must actually eliminate the exchanges: join and
  * aggregation on the bucket key plan shuffle-free, and bucket-key
  * equality filters prune to one bucket's files. */
class BucketingSpec extends SparkSpec {

  private def withSmj[A](f: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  private lazy val tablesReady: Unit = {
    Bucketing.writeBucketed(
      Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "bkt_orders", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.load(spark, sf0001, "customer").select(col("c_custkey").as("o_custkey"), col("c_name")),
      "bkt_customer", "o_custkey", buckets = 8)
  }

  test("same-bucket-count join on the bucket key plans with zero exchanges") {
    tablesReady
    withSmj {
      val j = Bucketing.colocatedJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p) // write-time shuffle reused
    }
  }

  test("aggregation on the bucket key plans with zero exchanges") {
    tablesReady
    val a = spark.table("bkt_orders").groupBy("o_custkey")
      .agg(sum("o_totalprice").as("t"))
    val p = a.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("bucket-key equality filter prunes to one bucket") {
    tablesReady
    // DisableUnnecessaryBucketedScan turns bucketed reading off for
    // plans with no interesting distribution; force it on to observe
    // the file-level bucket pruning itself
    val saved = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val f = spark.table("bkt_orders").filter(col("o_custkey") === 7)
      val p = f.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
  }

  test("joining and aggregating produce the same rows as the unbucketed plan") {
    tablesReady
    import spark.implicits._
    withSmj {
      val bucketed = Bucketing.colocatedJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
        .groupBy("o_custkey").count()
        .as[(Long, Long)].collect().toMap
      val plain = Tables.load(spark, sf0001, "orders")
        .join(Tables.load(spark, sf0001, "customer")
          .select(col("c_custkey").as("o_custkey")), "o_custkey")
        .groupBy("o_custkey").count()
        .as[(Long, Long)].collect().toMap
      assert(bucketed === plain)
    }
  }
}
