package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
 *  1. shard by id range and cumsum WITHIN each shard — `shards`
 *     parallel windows, never one big one;
 *  2. per-shard totals (≤ `shards` rows) prefix-summed by a bounded
 *     single-task window and broadcast-joined back as offsets.
 *
 * Shard fences are DETERMINISTIC literals, not `repartitionByRange`'s
 * run-scoped reservoir sample (round-2 advice: the sampled variant
 * needed an operator-owned `persist` with no unpersist point to pin one
 * boundary draw across jobs — a cache leak in a long-lived session).
 * Fences come from an md5-keyed top-`32·shards` id sample (a bounded
 * driver collect, the k-means/centroid pattern) thinned to `shards-1`
 * cut points, so `__pid` is a pure codegen'd function of the id: every
 * recomputation of any plan branch agrees by construction, nothing
 * needs pinning, and no cache outlives the call. Fence quality only
 * affects balance, never the answer — packing is a pure function of
 * the TOTAL ORDER of ids.
 *
 * Per-shard totals use `max_by(__cum, id)` (the cumsum at the LAST id),
 * not `max(__cum)` — the two agree only for non-negative token counts,
 * and a negative count would have silently corrupted every downstream
 * offset instead of being carried correctly (round-2 advice).
 */
object Packing {

  def packContiguous(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(shards >= 1, s"shards must be >= 1, got $shards — 0 would " +
      "silently degrade pass 1 to one global single-task window")
    // deterministic fences: the 32·shards md5-first ids (same bounded
    // TakeOrdered collect as IVF centroid picking), sorted, every
    // 32nd value — a uniform random-but-reproducible quantile sketch.
    val sampleN = shards * 32
    // null ids sort before every fence under `>=` (pid 0, nulls-first —
    // the same total order the window gives them) but must not BECOME a
    // fence: a null is not Comparable and `>= NULL` is never true
    // (review finding).
    val sampled = df.select(col(idCol)).filter(col(idCol).isNotNull)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleN).collect().map(_.get(0))
    require(sampled.isEmpty || sampled.head.isInstanceOf[Comparable[_]],
      s"$idCol values must be Comparable (got " +
        s"${sampled.headOption.map(_.getClass.getName).orNull}); " +
        "struct/array ids are not supported")
    implicit val anyOrd: Ordering[Any] =
      (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    val sorted = sampled.distinct.sorted
    val step = math.max(1, math.ceil(sorted.length.toDouble / shards).toInt)
    val fences = sorted.grouped(step).map(_.head).drop(1).toSeq
    val pidExpr: Column = fences
      .map(b => when(col(idCol) >= lit(b), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

    // null token counts are zero-length docs (a real slot of length 0
    // on the tape), not rows that silently vanish into null seq ids
    val staged = df.select(col(idCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as(tokensCol))
      .withColumn("__pid", pidExpr)
    val wLocal = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = staged.withColumn("__cum", sum(col(tokensCol)).over(wLocal))
    // pass 2, in-plan: ≤ `shards` total rows, so the unpartitioned
    // exclusive-prefix window is one task over a handful of rows.
    val wPrefix = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // tie on duplicate ids resolved toward the LARGER cumsum: max_by on
    // the id alone picks an arbitrary row among tied ids, and an
    // under-picked shard total would shift every later shard's offset
    // (overlapping tape slots)
    val offsets = local.groupBy("__pid")
      .agg(max_by(col("__cum"), struct(col(idCol), col("__cum")))
        .as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    // FLOOR division/modulo (pmod-derived), not truncating div/%: for
    // the negative __start a negative token count can produce, truncate
    // would collide the doc into seq 0 at a negative offset; for the
    // non-negative common case the two agree exactly
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, which
    // loses exactness past ~2^53 cumulative tokens — a real tape
    // position at trillion-token scale. The numerator is an exact
    // multiple of budget after the pmod subtraction, so integral
    // division is exact for any sign.
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__start", col("__cum") + col("__off") - col(tokensCol))
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"),
        expr(s"(__start - pmod(__start, ${budget}L)) div ${budget}L")
          .as("seq_id"),
        pmod(col("__start"), lit(budget)).as("seq_offset"))
  }

  /**
   * Padding-aware packing, the OTHER standard pretraining batch scheme:
   * documents never straddle a sequence boundary (no attention across a
   * cut), so sequences pad up to `budget`. Globally-optimal bin packing
   * is inherently sequential (NP-hard even offline); the distributed
   * scheme every large pipeline actually runs is LENGTH-BINNED packing:
   * group docs by exact token length, fill each sequence with
   * `budget div len` same-length docs — zero search, one window per
   * length group (parallel across lengths), deterministic, and padding
   * is bounded by `budget mod len` per sequence.
   *
   * Output keys a sequence by (n_tokens, bin_seq) — globally unique
   * without any cross-group coordination (a global dense id would need
   * exactly the prefix-sum machinery of [[packContiguous]] for no
   * modeling benefit). Docs longer than `budget` get a singleton
   * sequence (cap clamps to 1) — the caller chunks those with the
   * q78-style splitter first if truncation isn't acceptable.
   */
  def packBinned(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy("n_tokens").orderBy(col(idCol))
    // null token counts normalize to 0 (same as packContiguous): left
    // null, every unknown-length doc would land in one null-length
    // partition with __cap = budget — up to `budget` docs of unknown
    // real length per sequence, silently overflowing the budget the
    // operator exists to enforce
    df.select(col(idCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("__cap",
        greatest(lit(1L), expr(s"${budget}L div greatest(n_tokens, 1L)")))
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("n_tokens"),
        expr("__rn div __cap").as("bin_seq"),
        (col("__rn") % col("__cap")).as("slot"))
  }
}
