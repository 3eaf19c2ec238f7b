package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed (pre-shuffled) tables — the co-located-join layout for
 * joins that repeat at 100 TB. A fact table that joins on the same key
 * every day should not shuffle every day: `writeBucketed` pays the
 * hash-partition ONCE at write time (`bucketBy` + `sortBy` into the
 * metastore — the layout travels in the catalog entry, like the
 * reference's crawler-registered tables carry their partitioning), and
 * every later join/aggregation on that key plans with ZERO exchanges —
 * Spark trusts the on-disk `HashPartitioning(key, n)` and, with
 * `sortBy`, skips the sort-merge sort too (plan-asserted in
 * BucketingSpec).
 *
 * Rules the spec pins down (the ones that silently re-shuffle when
 * violated):
 *  - both sides bucketed on the JOIN key with the SAME bucket count
 *    (`spark.sql.sources.bucketing.enabled` on by default;
 *    mismatched counts re-shuffle the smaller side unless
 *    `bucketing.coalesceBucketsInJoin` applies);
 *  - the aggregation/groupBy key must be a superset-prefix of the
 *    bucket key for exchange-free aggregation;
 *  - bucket pruning: an equality filter on the bucket key scans 1/n
 *    of the files.
 *
 * Sizing at 100 TB: buckets ≈ table-size / target-partition-size
 * (128–512 MB post-compression); too few buckets → giant tasks, too
 * many → small files. Buckets also bound the q102 fingerprint-index
 * join and the IVF-PQ list layout (SCALING.md round-4 notes).
 */
object Bucketing {

  /** Write `df` as a bucketed (+optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with no
    * Exchange on either side (the write-time shuffle is reused). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
