package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental data card: the per-table profile a corpus datasheet
 * needs — row count, per-column null counts, sums/means, min/max,
 * approximate distincts, value histograms — maintained as STANDING
 * MERGEABLE STATE, so the card of a 100 TB table is refreshed by
 * folding each day's batch (cost ∝ batch) and NEVER by re-profiling
 * the corpus. "Datasheets for datasets" (Gebru et al., 2018) as a
 * streaming-maintainable artifact rather than a quarterly scan.
 *
 * Deliberately a THIN facade over [[Rollup]]: a profile is exactly a
 * rollup grouped by the constant key, so every property the rollup
 * already proves (fold ≡ from-scratch bit-equivalence, order
 * invariance, HLL register identity, manifest-committed generations,
 * idempotent streaming folds via [[graft.streaming.RollupStream]])
 * transfers to the card for free. Null counts ride the same state:
 * [[stage]] derives a 0/1 `isnull__c` column per tracked column and
 * sums it — one more conditional sum in the same single aggregate
 * pass, no extra scan.
 */
object DataCard {

  private[operators] val KeyCol = "__card"

  /** What the card tracks. `nulls` columns get a null COUNT; `sums`
    * get sum+mean (and their non-null count); `vars` add population
    * variance + stddev (dispersion — a datasheet without it is
    * incomplete; must also be in `sums`, whose state the variance
    * derivation reuses); `ndvs` approximate distincts; `hists` value
    * histograms ([[Rollup.histQuantile]] serves quantiles from the
    * standing counts). */
  final case class Card(nulls: Seq[String] = Nil, sums: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
      ndvs: Seq[String] = Nil, hists: Seq[Rollup.HistSpec] = Nil,
      vars: Seq[String] = Nil) {
    private[operators] def rollupSpec = Rollup.Spec(
      keys = Seq(KeyCol),
      sums = sums ++ nulls.map(c => s"isnull__$c"),
      mins = mins, maxs = maxs, ndvs = ndvs, hists = hists, vars = vars)
  }

  /** Invert a persisted rollup spec back into the Card that produced
    * it (the `graft_card(dir)` SQL path): a card's rollup spec is
    * exactly the constant `__card` key plus `isnull__`-prefixed sum
    * columns for the null counts, so both are mechanically recoverable.
    * None = not a card store (a plain rollup). */
  def fromRollupSpec(spec: Rollup.Spec): Option[Card] =
    if (spec.keys != Seq(KeyCol)) None
    else {
      val (nullSums, plainSums) =
        spec.sums.partition(_.startsWith("isnull__"))
      Some(Card(nulls = nullSums.map(_.stripPrefix("isnull__")),
        sums = plainSums, mins = spec.mins, maxs = spec.maxs,
        ndvs = spec.ndvs, hists = spec.hists, vars = spec.vars))
    }

  private def stage(df: DataFrame, card: Card): DataFrame =
    card.nulls.foldLeft(df.withColumn(KeyCol, lit("all"))) { (d, c) =>
      d.withColumn(s"isnull__$c", col(c).isNull.cast("double"))
    }

  def init(spark: SparkSession, storeDir: String, df: DataFrame,
      card: Card): Unit =
    Rollup.init(spark, storeDir, stage(df, card), card.rollupSpec)

  /** Fold a batch into the standing card (cost ∝ batch + one state
    * row). */
  def fold(spark: SparkSession, storeDir: String, df: DataFrame,
      card: Card): Unit =
    Rollup.fold(spark, storeDir, stage(df, card), card.rollupSpec)

  /** Continuous card maintenance: each micro-batch of `rows` folds
    * into the standing card through
    * [[graft.streaming.RollupStream.maintain]], inheriting its
    * re-delivery idempotency (checkpoint-identity-tagged commits). A
    * table's datasheet stays one narrow read behind the stream head. */
  def maintain(rows: DataFrame, storeDir: String, card: Card,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.RollupStream.maintain(stage(rows, card), storeDir,
      card.rollupSpec, checkpoint, trigger)

  /** The card as one wide row: `n_rows`, `nulls__c` (count),
    * `sum__c`/`avg__c`, `var__c`/`stddev__c`, `min__c`/`max__c`,
    * `ndv__c`, `hist__c`. */
  def read(spark: SparkSession, storeDir: String, card: Card): DataFrame = {
    val fin = Rollup.finalized(Rollup.read(spark, storeDir),
      card.rollupSpec)
    val renamed = card.nulls.foldLeft(fin) { (d, c) =>
      d.withColumn(s"nulls__$c",
          col(s"sum__isnull__$c").cast("long"))
        .drop(s"sum__isnull__$c", s"avg__isnull__$c")
    }
    renamed.drop(KeyCol)
  }
}
