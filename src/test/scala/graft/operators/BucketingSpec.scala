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

  test("compactTable merges append debris to one file per bucket, keeps rows + layout") {
    import spark.implicits._
    val orders = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(orders.filter(col("o_orderkey") % 3 === 0),
      "bkt_compact", "o_custkey", buckets = 4)
    try {
      // two daily appends — each adds files on top of the base write
      Seq(1, 2).foreach { r =>
        orders.filter(col("o_orderkey") % 3 === r)
          .write.mode("append").format("parquet")
          .bucketBy(4, "o_custkey").sortBy("o_custkey")
          .saveAsTable("bkt_compact")
      }
      def dataFiles: Seq[java.io.File] = {
        val loc = java.net.URI.create(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("bkt_compact"))
          .location.toString)
        new java.io.File(loc.getPath).listFiles()
          .filter(f => f.getName.endsWith(".parquet")).toSeq
      }
      assert(dataFiles.size > 4, s"expected append debris, got ${dataFiles.size} files")
      val before = spark.table("bkt_compact")
        .as[(Long, Long, Double)].collect().toSet
      Bucketing.compactTable(spark, "bkt_compact")
      assert(dataFiles.size === 4,
        s"one file per bucket after compaction; got:\n${dataFiles.map(_.getName).sorted.mkString("\n")}")
      assert(spark.table("bkt_compact")
        .as[(Long, Long, Double)].collect().toSet === before)
      // the compacted table still carries the bucket layout: aggregation
      // on the bucket key plans exchange-free
      val p = spark.table("bkt_compact").groupBy("o_custkey")
        .agg(sum("o_totalprice")).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_compact")
  }

  test("compactSignatureStore: admission pairs unchanged, both tables single-file-per-bucket") {
    import spark.implicits._
    def htext(i: Long): String =
      (1 to 8).map(j => (i * 1000003L + j * 7919L) % 100000000L).mkString(" ")
    val history = (1L to 100L).map(i => (i, htext(i))).toDF("doc_id", "text")
    Dedup.buildSignatureStoreBucketed(history, "doc_id", "text",
      "sig_compact", buckets = 4)
    try {
      // two daily appends accrete files in both standing tables
      Dedup.appendSignaturesBucketed(spark,
        (201L to 230L).map(i => (i, htext(i))).toDF("doc_id", "text"),
        "doc_id", "text", "sig_compact", buckets = 4)
      Dedup.appendSignaturesBucketed(spark,
        (301L to 330L).map(i => (i, htext(i))).toDF("doc_id", "text"),
        "doc_id", "text", "sig_compact", buckets = 4)
      val batch = Seq((9001L, htext(42L)), (9002L, htext(210L)))
        .toDF("doc_id", "text")
      val before = Dedup.minhashLshIncrementalBucketed(spark, batch,
        "doc_id", "text", "sig_compact")
        .as[(Long, Long, Double)].collect().toSet
      assert(before.map(p => (p._1, p._2)) === Set((42L, 9001L), (210L, 9002L)))
      Dedup.compactSignatureStore(spark, "sig_compact")
      def nFiles(t: String): Int = {
        val loc = java.net.URI.create(spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
          .location.toString)
        new java.io.File(loc.getPath).listFiles()
          .count(_.getName.endsWith(".parquet"))
      }
      assert(nFiles("sig_compact_sigs") === 4)
      assert(nFiles("sig_compact_bands") === 4)
      assert(Dedup.minhashLshIncrementalBucketed(spark, batch,
        "doc_id", "text", "sig_compact")
        .as[(Long, Long, Double)].collect().toSet === before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sig_compact_sigs")
      spark.sql("DROP TABLE IF EXISTS sig_compact_bands")
    }
  }
}
