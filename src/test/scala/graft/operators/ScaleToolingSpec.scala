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

  test("ScaleFixture rejects factors past its distinct-transform bounds") {
    // text: the Caesar shift cycles after |wheel|-1 = 61 copies; k = 63
    // would give copy 62 the same rotation as copy 1 — byte-identical
    // cross-copy documents. Checked before any read or write.
    val e = intercept[IllegalArgumentException] {
      graft.tools.ScaleFixture.scale(spark, "/nonexistent", "/tmp/never", 63)
    }
    assert(e.getMessage.contains("text rotations"))
    // embeddings: the rotation cycles after dim-1 copies; a dim-4 source
    // caps the factor at 4 even though the text wheel allows more
    val src = java.nio.file.Files.createTempDirectory("sfx").toString
    Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$src/embeddings.parquet")
    val e2 = intercept[IllegalArgumentException] {
      graft.tools.ScaleFixture.scale(spark, src, "/tmp/never", 10)
    }
    assert(e2.getMessage.contains("embedding rotations"))
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
