package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement (not part of the driver contract): pre-verify
  * SimHash candidate volume of the w=64 vs w=128 banding on a scale
  * fixture's documents — the number SCALING.md's wide-signature claim
  * quotes. Usage: runMain graft.tools.SimhashVolume [sfDir] [radius] */
object SimhashVolume {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val radius = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val n = docs.count()
    val (narrow, wide) =
      graft.operators.Dedup.simhashCandidateVolume(
        docs, "doc_id", "text", radius)
    println(s"""{"docs":$n,"radius":$radius,"cand_w64":$narrow,""" +
      s""""cand_w128":$wide,"ratio":${narrow.toDouble / math.max(1L, wide)}}""")
    spark.stop()
  }
}
