package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Runtime bloom-filter pre-join: build a bloom filter over the small
 * side's join keys, apply it to the fact side BEFORE the shuffle, then
 * run the real join on the survivors.
 *
 * This is the shuffle-reduction play for selective fact⋈dim joins that
 * are too big to broadcast but whose dim side matches few fact rows:
 * Spark's own AQE runtime filter (`spark.sql.optimizer.runtime
 * .bloomFilter.enabled`) injects exactly this shape when its cost
 * heuristics allow; this operator makes it explicit and unconditional.
 * At 100 TB, filtering 99% of the fact side before the exchange is the
 * difference between shuffling 100 TB and shuffling 1 TB — the bloom's
 * false-positive rows (~1%) are dropped by the exact join afterwards,
 * so results are identical to a plain join.
 *
 * The filter itself travels as a binary literal in the fact-side
 * predicate (the bloom over `expectedItems` keys is MBs at most — same
 * driver-collect-then-broadcast pattern as the IVF centroids; the
 * whole point is that it is small even when the dim side's ROWS are
 * too wide/many to broadcast as a hash relation).
 */
object BloomJoin {

  /** Bloom filter (as bytes) over xxhash64 of `key` in `dim`. */
  def keyBloom(dim: DataFrame, key: String, expectedItems: Long): Array[Byte] =
    dim.select(GraftFunctions.graftBloomAgg(xxhash64(col(key)), expectedItems)
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** `might_contain` predicate for `key` against a built bloom. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftFunctions.graftMightContain(lit(bloom), xxhash64(key))

  /**
   * Inner equi-join `fact ⋈ dim` on `key`, with the fact side
   * bloom-pre-filtered. Exact: bloom false positives are eliminated by
   * the join itself.
   *
   * `dim` is scanned twice (bloom-build action now, join later) and
   * deliberately NOT persisted here: an operator-owned persist has no
   * unpersist point (the join is lazy), so it leaked cached blocks
   * across calls in a long-lived session (round-2 advice). The dim side
   * is small by contract; callers who still want the cache own its
   * lifecycle and pass a persisted frame.
   *
   * An EMPTY dim yields a null bloom (aggregate over zero rows) — short-
   * circuited to `false`, so the join is correctly empty instead of
   * failing analysis on a NullType literal.
   */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = keyBloom(dim, key, expectedItems)
    val pred = if (bloom == null) lit(false) else mightContain(bloom, col(key))
    fact.filter(pred).join(dim, key)
  }
}
