package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Loader for the driver-provided scaled parquet tables (TESTDATA.md).
 *
 * One quirk: `events.parquet` has stored `ts` as Parquet INT64
 * TIMESTAMP(NANOS) in some driver generations (which Spark 4.x rejects
 * unless `spark.sql.legacy.parquet.nanosAsLong` reads it as bigint
 * epoch-nanos) and as TIMESTAMP(MICROS) in others (read natively as
 * TIMESTAMP_NTZ). [[load]] normalizes the nanos form to a real
 * timestamp, so downstream queries can uniformly do
 * `unix_micros(cast(ts as timestamp))` (session tz is UTC at every
 * entry point, making the NTZ→LTZ cast an identity on the wall clock
 * and the epoch math engine-portable against DuckDB's `epoch_us`).
 */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    // SESSION-WIDE and deliberate: the conf must stay set while the
    // returned (lazy) DataFrame executes — the parquet scan consults
    // it at run time, so a set-read-restore scope would break the DF
    // it just built. Only an UNSET conf is claimed: a caller who
    // explicitly configured the legacy nanos decoding keeps their
    // choice (and an explicit 'false' fails the events read loudly
    // rather than being silently overridden here).
    if (name == "events" &&
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
   *
   * Idempotent, like the reference's run-once crawler
   * (`/root/reference/README.md:314` — crawl once, query many): a table
   * already registered at the SAME location is left untouched, so repeat
   * calls (every q29 run) cost ten metastore lookups, not ten rounds of
   * serial Hive/Derby DROP+CREATE DDL on the driver. Only a location
   * change (new sfDir) pays the DDL to swap the entry.
   *
   * The skip keeps the schema CREATE inferred: if the parquet at a
   * registered location is REGENERATED with different columns, the
   * catalog entry is stale — pass `force = true` to re-crawl (the
   * re-run-the-crawler analog; also re-run [[analyzeAll]], whose stats
   * go stale the same way).
   */
  def registerAllAsTables(spark: SparkSession, sfDir: String,
      db: String = "graft", force: Boolean = false): Unit = {
    graft.functions.GraftFunctions.register(spark)
    // same claim-only-if-unset discipline as load() — never override an
    // explicit caller setting
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val catalog = spark.sessionState.catalog
    if (!catalog.databaseExists(db)) spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // location comparison in QUALIFIED Hadoop-Path form: java.io.File
    // canonicalization is wrong for any non-local sfDir (an s3a:// URI
    // resolves against the driver cwd, so the idempotency check never
    // matches and every call pays the full DDL round)
    def qualified(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(hp).toString
    }
    all.foreach { n =>
      val loc = s"$sfDir/$n.parquet"
      // events may carry TIMESTAMP(NANOS) read as bigint: the catalog
      // entry then exposes epoch-nanos a SQL user would misread as
      // seconds. Register the raw table as events_raw and serve a
      // persisted VIEW `events` with the same normalized TIMESTAMP ts
      // the registerAll() views expose — catalog consumers see one
      // consistent schema either way.
      val nanosTs = n == "events" && {
        val f = spark.read.parquet(loc).schema.fields.find(_.name == "ts")
        f.exists(_.dataType == org.apache.spark.sql.types.LongType)
      }
      val tbl = if (nanosTs) s"${n}_raw" else n
      val id = org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some(db))
      val want = qualified(loc)
      val current =
        if (catalog.tableExists(id))
          Some(qualified(catalog.getTableMetadata(id).location.toString))
        else None
      if (force || !current.contains(want)) {
        spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
        // the QUALIFIED location: a relative sfDir handed to the DDL
        // resolves against the warehouse dir (not the cwd a direct
        // read uses) — the table then points at nothing and every scan
        // fails schema inference
        spark.sql(s"CREATE TABLE $db.$tbl USING PARQUET LOCATION '$want'")
      }
      if (nanosTs) {
        val sel = spark.table(s"$db.$tbl").schema.fields.map { f =>
          if (f.name == "ts") "timestamp_micros(ts div 1000) AS ts"
          else s"`${f.name}`"
        }
        // a stale entry registered as a raw TABLE by an older run must
        // drop via DROP TABLE; an existing VIEW just replaces
        val vid = org.apache.spark.sql.catalyst.TableIdentifier(n, Some(db))
        if (catalog.tableExists(vid) && catalog.getTableMetadata(vid)
            .tableType != org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW)
          spark.sql(s"DROP TABLE IF EXISTS $db.$n")
        spark.sql(s"CREATE OR REPLACE VIEW $db.$n AS " +
          s"SELECT ${sel.mkString(", ")} FROM $db.$tbl")
      }
    }
  }

  /**
   * ANALYZE every registered `db` table (row count + per-column NDV /
   * min / max / null counts into the metastore). At 100 TB the
   * cost-based optimizer's join-strategy and join-REORDER decisions
   * hang off these statistics — file size alone mis-sizes selective
   * dimension tables (a filtered scan of a wide table can be tiny), so
   * a catalog without stats forces the planner into worst-case
   * assumptions. Run once after registration/refresh, like the
   * reference's crawler publishing table metadata alongside locations.
   */
  def analyzeAll(spark: SparkSession, db: String = "graft"): Unit =
    all.foreach { n0 =>
      // ANALYZE targets the physical table: `events` may be the
      // normalized VIEW over `events_raw` (see registerAllAsTables)
      val id = org.apache.spark.sql.catalyst.TableIdentifier(n0, Some(db))
      val isView = spark.sessionState.catalog.tableExists(id) &&
        spark.sessionState.catalog.getTableMetadata(id).tableType ==
          org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW
      val n = if (isView) s"${n0}_raw" else n0
      // column stats only exist for scalar types — skip array/map/struct
      // columns (e.g. embeddings.embedding) rather than failing the table
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val atomic = spark.table(s"$db.$n").schema.fields.collect {
        case f if !f.dataType.isInstanceOf[ArrayType] &&
            !f.dataType.isInstanceOf[MapType] &&
            !f.dataType.isInstanceOf[StructType] =>
          s"`${f.name}`"
      }
      if (atomic.isEmpty)
        spark.sql(s"ANALYZE TABLE $db.$n COMPUTE STATISTICS")
      else
        spark.sql(s"ANALYZE TABLE $db.$n COMPUTE STATISTICS " +
          s"FOR COLUMNS ${atomic.mkString(", ")}")
    }
}
