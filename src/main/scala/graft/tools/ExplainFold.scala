package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (not part of the driver contract): dump the PHYSICAL
  * plan of q123's fold-side enrich join — the join the returned view
  * read cannot show (it happens inside the commit) — so the r17 plan
  * audit's broadcast claim is checkable against a committed artifact.
  * Usage: runMain graft.tools.ExplainFold > plans/r17/q123_fold_join.txt */
object ExplainFold {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = graft.sources.Tables.load(spark, dir, n)
    val facts = t("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .filter(pmod(col("o_orderkey"), lit(3)) === 1)
    val dim = t("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"),
        col("c_acctbal"))
    // the foldFacts enrich: batch ⋈ current dim (JoinView.enrich)
    facts.join(dim, Seq("o_custkey"), "inner")
      .withColumn("op", lit("U"))
      .explain("formatted")
    spark.stop()
  }
}
