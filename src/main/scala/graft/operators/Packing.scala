package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining batches: lay documents on a
 * contiguous token tape (doc order = `idCol` order) and cut the tape
 * into fixed-`budget` sequences. Each doc gets the sequence id and
 * intra-sequence offset of its FIRST token; docs may straddle a cut —
 * exactly the concat-then-chunk scheme pretraining pipelines use.
 *
 * The computation is a global prefix sum, which the naive Window form
 * (`ORDER BY id` with no partition) computes on ONE task — the classic
 * driver-shaped bottleneck at 100 TB. [[packContiguous]] runs the
 * textbook two-pass distributed prefix sum instead:
 *
 *  1. range-repartition by id (total order across partitions, ~equal
 *     sizes from sampling) and cumsum WITHIN each partition — `shards`
 *     parallel windows, never one big one;
 *  2. per-partition totals (≤ `shards` rows — a bounded driver collect,
 *     the k-means pattern) prefix-summed on the driver and added back
 *     as a literal-map offset.
 *
 * Range boundaries come from sampling, but the result only depends on
 * the TOTAL ORDER of ids — boundary placement cannot change any doc's
 * (seq_id, seq_offset), so output is deterministic and the oracle can
 * recompute it with a plain window.
 */
object Packing {

  def packContiguous(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val ranged = df.select(col(idCol), col(tokensCol))
      .repartitionByRange(shards, col(idCol))
      .withColumn("__pid", F.spark_partition_id())
    // parallel per-partition cumsum (the window's hash exchange on __pid
    // preserves whole range-buckets — still `shards`-way parallel).
    // PERSISTED before the totals action: the totals collect and the
    // final projection are two separate jobs, and an unpersisted plan
    // would re-run repartitionByRange with a fresh reservoir sample —
    // re-drawn boundaries would shift rows between __pids and make the
    // collected offsets lie (review finding; latent at test sizes where
    // sampling is exhaustive). The cache pins one partitioning for both.
    val wLocal = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__cum", sum(col(tokensCol)).over(wLocal))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 2: bounded collect of per-partition totals → exclusive prefix
    // offsets, shipped back as a literal map (empty partitions absent)
    val totals = local.groupBy("__pid").agg(max("__cum").as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (pid, tot) => val o = (pid, acc); acc += tot; o }.toMap
    }
    val offsetExpr = coalesce(
      element_at(typedlit(offsets), col("__pid")), lit(0L))
    local
      .withColumn("__start", col("__cum") + offsetExpr - col(tokensCol))
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"),
        expr(s"__start div ${budget}L").as("seq_id"),
        (col("__start") % budget).as("seq_offset"))
  }
}
