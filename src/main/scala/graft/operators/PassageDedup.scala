package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/**
 * Passage-level exact substring dedup — the within-document granularity
 * the whole-doc pipelines ([[Dedup.exact]], MinHash) cannot see: a
 * boilerplate paragraph pasted into thousands of otherwise-unique pages
 * never trips a document-level signature, but dominates the token
 * budget. (Suffix-array substring dedup à la Lee et al. 2022,
 * "Deduplicating Training Data Makes Language Models Better", is the
 * exact form; fixed token windows are its standard distributed
 * approximation — window hits are verbatim repeats by construction.)
 *
 * A document's token stream is cut into NON-overlapping `w`-token
 * passages (full windows only — the sub-`w` tail can't be a `w`-token
 * repeat). A passage occurrence is duplicated when its text occurs ≥ 2
 * times corpus-wide (within- or cross-document).
 *
 * Scale shape: tokens staged as an attribute (shingle-family rule),
 * passages via one doc-local codegen'd `transform` (no explode of
 * overlapping shingles — exactly n/w rows emitted per doc), corpus
 * multiplicity via a map-side-combined aggregate on the passage key
 * joined back (duplicated keys only) — deliberately NOT a window
 * count: the boilerplate passage is the hot key, and a window sorts
 * all its occurrences in one unsplittable task, while the
 * aggregate+join form partial-combines before the shuffle and AQE
 * can skew-split the join — then a per-doc keyed rollup.
 *
 * Key width: `hashKey = true` replaces the passage STRING key with its
 * xxhash64 — the SAME two-exchange plan with an 8-byte key instead of
 * a w-token string, the shuffle-width choice for 100 TB. A 64-bit
 * collision (≈ n²/2⁶⁵: ~0.003 expected false pairs at 10 billion
 * passages) can only OVER-flag a unique passage as duplicated, never
 * miss a real duplicate — the conservative direction for dedup.
 * String mode stays the default because the DuckDB oracle replays it
 * bit-exactly (q90); PassageDedupSpec property-checks the two modes
 * equal.
 */
object PassageDedup {

  /** (id, passage) occurrences: non-overlapping `w`-token windows. */
  def passages(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    require(w >= 1, s"passage width must be >= 1, got $w")
    df.select(col(idCol).as("id"), T.tokens(col(textCol)).as("ts"))
      .select(col("id"), expr(s"size(ts) div $w").cast("int").as("nw"), col("ts"))
      .select(col("id"), explode(
        when(col("nw") >= 1, transform(sequence(lit(0), col("nw") - 1),
          i => concat_ws(" ", slice(col("ts"), i * w + 1, lit(w)))))
          .otherwise(array().cast("array<string>"))).as("p"))
  }

  /** Per-doc duplicated-passage stats: every input doc appears once,
    * zero-passage docs included (n_passages = 0, dup_fraction = 0).
    * `hashKey` narrows the multiplicity exchange to the 64-bit passage
    * hash (see class scaladoc). */
  def stats(df: DataFrame, idCol: String, textCol: String, w: Int,
      hashKey: Boolean = false): DataFrame = {
    val keyed = passages(df, idCol, textCol, w)
      .select(col("id"),
        (if (hashKey) xxhash64(col("p")) else col("p")).as("k"))
    // multiplicity via MAP-SIDE-COMBINED aggregate + join-back, never
    // count().over(partitionBy(k)): the boilerplate passage this
    // operator exists for IS the hot key, and a window would sort all
    // of its occurrences in ONE task (unsplittable straggler/OOM),
    // while the aggregate partials combine before the shuffle and the
    // join-back is an SMJ that AQE's skew-join can split. Only the
    // DUPLICATED keys join back — the common unique passage never
    // re-shuffles its occurrence rows.
    val dups = keyed.groupBy("k").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("k"), lit(true).as("__dup"))
    val perDoc = keyed.join(dups, Seq("k"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_passages"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_dup") / col("n_passages").cast("double"), 4))
          .as("dup_fraction"))
  }
}
