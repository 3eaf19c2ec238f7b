package graft.sources

import org.apache.spark.sql.catalyst.TableIdentifier

import graft.SparkSpec

/** ANALYZE must land table and column statistics in the metastore —
  * the inputs the cost-based optimizer's join sizing/reorder read. */
class CatalogStatsSpec extends SparkSpec {

  test("analyzeAll publishes row counts and per-column stats") {
    Tables.registerAllAsTables(spark, sf0001)
    Tables.analyzeAll(spark)
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("orders", Some("graft")))
    val st = meta.stats.getOrElse(fail("no table statistics after ANALYZE"))
    assert(st.rowCount.exists(_ > 0L), st)
    assert(st.sizeInBytes > 0, st)
    val custStats = st.colStats.getOrElse("o_custkey",
      fail(s"no column stats for o_custkey: ${st.colStats.keySet}"))
    assert(custStats.distinctCount.exists(_ > 0), custStats)
    assert(custStats.nullCount.contains(BigInt(0)), custStats)
  }

  test("catalog events exposes a real TIMESTAMP ts, same as the session views") {
    Tables.registerAllAsTables(spark, sf0001)
    // nanos-generation parquet reads ts as bigint; the catalog entry
    // then serves a persisted VIEW with the normalized TIMESTAMP so a
    // SQL user's cast/date arithmetic is not silently off by 1e9. The
    // invariant either way: catalog ts is a timestamp (same type the
    // session views expose), never a raw bigint
    val t = spark.table("graft.events").schema("ts").dataType
    assert(t === Tables.load(spark, sf0001, "events").schema("ts").dataType, t)
    assert(t !== org.apache.spark.sql.types.LongType, t)
    // the view row set equals the session-view load() path
    val viaView = spark.table("graft.events").count()
    assert(viaView === Tables.load(spark, sf0001, "events").count())
    val tsSample = spark.sql(
      "SELECT year(ts) AS y FROM graft.events LIMIT 1").head().getInt(0)
    assert(tsSample > 2000 && tsSample < 2100, s"year=$tsSample")
    // idempotency: a second call does not fail on the existing view
    Tables.registerAllAsTables(spark, sf0001)
    assert(spark.table("graft.events").count() === viaView)
  }
}
