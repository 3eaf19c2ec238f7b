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
}
