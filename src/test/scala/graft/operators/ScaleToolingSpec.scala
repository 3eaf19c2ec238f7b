package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleToolingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join (order-insensitive)") {
    // skewed: 90% of left rows share key 1
    val large = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "tag")
    val salted = Skew.saltedJoin(large, small, "k", salt = 4)
      .select("k", "payload", "tag").as[(Long, Int, String)].collect().sorted
    val plain = large.join(small, "k")
      .select("k", "payload", "tag").as[(Long, Int, String)].collect().sorted
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 902) // 900 hot + 2 cold
  }

  test("saltedJoin rejects salts that would silently empty the join") {
    val large = Seq((1L, 1)).toDF("k", "payload")
    val small = Seq((1L, "x")).toDF("k", "tag")
    // pmod(x, 0) is NULL in non-ANSI Spark → every join key NULL →
    // silently empty result; must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, "k", salt = 0)
    }
    assert(e.getMessage.contains("salt"))
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(large.withColumn("__salt", lit(1)), small, "k")
    }
    assert(e2.getMessage.contains("__salt"))
  }

  test("ScaleFixture transform families (r14): bound still loud; affine maps pairwise near-disjoint; factors past the old caps keep copies distinct, norms intact, cross-copy shingles incidental") {
    // the (much larger) affine bound still fails loudly, before any read
    val e = intercept[IllegalArgumentException] {
      graft.tools.ScaleFixture.scale(spark, "/nonexistent", "/tmp/never",
        3661)
    }
    assert(e.getMessage.contains("affine text maps"))
    // any two distinct copies' char maps agree on AT MOST ONE character
    // (the prime-wheel affine property the linear-pair-density promise
    // rests on), and none is the identity
    val maps = (1 to 100).map(graft.tools.ScaleFixture.affineTarget)
    assert(maps.distinct.size === 100)
    val wheel61 = "abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345678"
    maps.foreach(m => assert(m !== wheel61))
    for (pair <- maps.combinations(2)) {
      val agree = pair(0).zip(pair(1)).count { case (a, b) => a == b }
      assert(agree <= 1, s"two affine maps agree on $agree characters")
    }
    // a factor past BOTH old caps (61 text shifts, dim-1=63 rotations)
    // now scales — and the copies stay genuinely distinct
    val dst = java.nio.file.Files.createTempDirectory("sfx70").toString
    graft.tools.ScaleFixture.scale(spark, sf0001, dst, 70)
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val srcEmb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val vid0 = srcEmb.select(min("vec_id")).head.getLong(0)
    val stride = {
      val mx = srcEmb.agg(max("vec_id")).head.getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    val copies = (0 until 70).map { i =>
      emb.filter(col("vec_id") === vid0 + i * stride)
        .select("embedding").as[Seq[Float]].head()
    }
    assert(copies.map(_.toList).distinct.size === 70,
      "two copies produced identical vectors")
    val norm0 = math.sqrt(copies.head.map(x => x.toDouble * x).sum)
    copies.foreach { v =>
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nv - norm0) < 1e-4,
        "per-copy transform must be norm-preserving")
    }
    // documents: one source doc's 70 copies are pairwise distinct and
    // share only an incidental fraction of their 5-grams (punctuation/
    // fixed-'9'/single-agreeing-char grams)
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val srcDocs = spark.read.parquet(s"$sf0001/documents.parquet")
    val did0 = srcDocs.select(min("doc_id")).head.getLong(0)
    val dStride = {
      val mx = srcDocs.agg(max("doc_id")).head.getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    val texts = (0 until 70).map { i =>
      docs.filter(col("doc_id") === did0 + i * dStride)
        .select("text").as[String].head()
    }
    assert(texts.distinct.size === 70)
    def grams(t: String): Set[String] =
      t.sliding(5).toSet
    val g0 = grams(texts(1))
    (2 until 70).foreach { i =>
      val shared = (g0 & grams(texts(i))).size.toDouble /
        math.max(1, g0.size)
      assert(shared < 0.10,
        f"copies 1 and $i share $shared%.2f of their 5-grams")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.range(0, 1000).withColumn("v", col("id") * 2)
        .write.bucketBy(8, "id").sortBy("id").saveAsTable("bkt_a")
      spark.range(0, 1000).withColumn("w", col("id") + 5)
        .write.bucketBy(8, "id").sortBy("id").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be co-located, got:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
