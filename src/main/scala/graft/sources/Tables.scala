package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Loader for the driver-provided scaled parquet tables (TESTDATA.md).
 *
 * One quirk: `events.parquet` stores `ts` as Parquet INT64 TIMESTAMP(NANOS),
 * which Spark 4.x rejects by default; `spark.sql.legacy.parquet.nanosAsLong`
 * reads it as bigint epoch-nanos. We set it lazily here so every entry point
 * (Verify, Bench, tests) gets it without duplicating config.
 */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works over sfDir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
