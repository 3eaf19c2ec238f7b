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

  /**
   * S7 — register every scaled table as a PERSISTED catalog table in
   * `db`: an external parquet-location table, the Glue-catalog analog
   * (catalog metadata over data in place — no copy, exactly what the
   * reference's crawler+catalog does for S3 prefixes). Unlike
   * [[registerAll]]'s session-scoped views, resolution goes through the
   * metastore: name → location → schema all come from the catalog
   * entry, and the table survives view-less sessions against the same
   * warehouse. Re-registration against a different sfDir replaces the
   * entry (external: DROP removes only metadata, never data).
   */
  def registerAllAsTables(spark: SparkSession, sfDir: String,
      db: String = "graft"): Unit = {
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    all.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$n")
      spark.sql(s"CREATE TABLE $db.$n USING PARQUET LOCATION '$sfDir/$n.parquet'")
    }
  }
}
