package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LandingSpec extends SparkSpec {
  import spark.implicits._

  test("all four landing formats round-trip rows and values") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", -0.5))
      .toDF("id", "name", "score")
    Landing.formats.foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"land_$fmt").toString + "/t"
      Landing.write(df, dir, fmt)
      val back = Landing.read(spark, dir, fmt)
        .select(col("id").cast("long"), col("name"), col("score").cast("double"))
        .as[(Long, String, Double)].collect().sortBy(_._1)
      assert(back.toSeq === Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", -0.5)),
        s"format $fmt")
    }
  }

  test("json landing write is gzip'd (reference GZIP landing)") {
    val dir = java.nio.file.Files.createTempDirectory("landgz").toString + "/t"
    Landing.write(Seq(1, 2, 3).toDF("v"), dir, "json")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
  }

  test("unsupported format is rejected") {
    intercept[IllegalArgumentException] {
      Landing.read(spark, "/tmp/x", "avro")
    }
  }
}
