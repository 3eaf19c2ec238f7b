package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement (not part of the driver contract): the probed
  * SHARE a recall-calibrated IVF store actually needs at each corpus
  * scale — the number behind SCALING.md's "per-query cost stops
  * growing linearly" claim. Builds an adaptively-sized store per
  * sfDir, calibrates to the target, prints one JSON line per dir.
  * Usage: runMain graft.tools.CalibrationShare <sfDir> [sfDir...]
  * (CAL_ITERS sets quantizer training iterations; default 0). */
object CalibrationShare {
  def main(args: Array[String]): Unit = {
    val iters = sys.env.get("CAL_ITERS").map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e = graft.sources.Tables.load(spark, dir, "embeddings")
      val n = e.count()
      val store = java.nio.file.Files.createTempDirectory("calshare")
        .toString + "/store"
      graft.operators.Similarity.buildIvfStore(e, store, nlist = 0,
        iters = iters, dim = 64)
      val q = e.filter(col("vec_id") < 32)
      val np = graft.operators.Similarity.calibrateIvfStore(spark, store,
        q, k = 5, targetRecall = 0.9, sampleN = 32)
      val nlist = spark.read.parquet(store + "/centroids").count().toInt
      println(s"""{"dir":"$dir","n":$n,"nlist":$nlist,"nprobe":$np,""" +
        s""""share":${np.toDouble / nlist},"const_share_np":""" +
        s"""${math.max(1, math.ceil(nlist * 0.375).toInt)}}""")
    }
    spark.stop()
  }
}
