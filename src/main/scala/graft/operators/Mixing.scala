package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/**
 * Weighted-mixture materialization: turn per-source mix weights (the
 * q93 domain-mix output — temperature-scaled "implied epochs") into an
 * actual sampled/replicated corpus, deterministically.
 *
 * A weight w for a source means every one of its documents appears
 * `floor(w)` times, plus once more for the `frac(w)` fraction of
 * documents admitted by a portable id-hash draw — so upsampling
 * (w > 1, rare high-quality sources) and downsampling (w < 1,
 * over-represented crawl) fall out of the same rule, and
 * E[copies per doc] = w exactly. The id-hash draw (not rand()) makes
 * the sample reproducible across runs/engines/partitionings and
 * re-draws (salt), the [[DatasetSplit]] discipline: one id, one
 * admission decision, forever — and the same length-prefixed `id:salt`
 * key encoding so ids containing ':' cannot alias another (id, salt).
 *
 * Scale shape: zero joins and zero shuffles — the weight lookup ships
 * as a map literal (mixes are ~tens of sources; a million-source mix
 * would broadcast-join a weights table instead), the admission hash
 * and the copy generator are per-row codegen'd projections. Output
 * size ∝ Σ w_s·n_s, the property the mix was designed to hit.
 */
object Mixing {

  /** Token-budget mix planning: the step BEFORE [[materialize]] — a
    * training mix is specified as token fractions of a token budget
    * ("50% en, 20% code, …, 1T tokens total"), but materialization
    * needs per-source implied-epoch weights. Given per-source token
    * totals (from a [[DataCard]] / one tokenCount aggregate — never
    * re-tokenize to plan) and target fractions summing to 1, the
    * weight is `w_s = budget·frac_s / tokens_s`: sources the target
    * over-represents relative to their inventory upsample (w > 1),
    * over-inventoried sources downsample (w < 1), and
    * Σ w_s·tokens_s = budget exactly. Sources absent from `targets`
    * drop (frac 0). Output: (source, tokens, target_frac, wt) —
    * feed `wt` to [[materialize]]/[[materializeFromTable]]. */
  def planTokenBudget(tokenTotals: DataFrame, sourceCol: String,
      tokensCol: String, targets: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(targets.values.forall(_ >= 0.0), "fractions must be >= 0")
    require(math.abs(targets.values.sum - 1.0) < 1e-9,
      s"target fractions must sum to 1, got ${targets.values.sum}")
    val planned = tokenTotals
      .withColumn("target_frac",
        element_at(typedlit(targets), col(sourceCol)))
      .filter(col("target_frac").isNotNull && col(tokensCol) > 0)
      .select(col(sourceCol),
        col(tokensCol).cast("long").as("tokens"),
        col("target_frac").cast("double").as("target_frac"),
        (lit(budgetTokens.toDouble) * col("target_frac")
          / col(tokensCol)).as("wt"))
    // the budget identity Σ wt·tokens = budget only holds if every
    // positively-weighted target HAS inventory — a target with no
    // (or zero) tokens would silently under-run the budget by its
    // whole fraction. ONE mix-sized collect (≤ |targets| rows) serves
    // both the check and the returned plan — evaluating the input a
    // second time could see different totals (nondeterministic or
    // concurrently-folded inventory) and return a plan the check
    // never saw.
    val rows = planned.collect().toIndexedSeq
    val have = rows.map(_.getString(0)).toSet
    // duplicate inventory rows (e.g. a union of two snapshots) would
    // give EACH copy the full wt = budget·frac/tokens and double that
    // source's share — the dual of materializeFromTable's duplicate-
    // source guard, enforced on the same collected rows as the
    // missing-inventory check
    require(rows.size == have.size,
      s"tokenTotals carries duplicate rows for source(s): " +
        rows.groupBy(_.getString(0)).collect {
          case (s, rs) if rs.size > 1 => s
        }.mkString(", "))
    val missing = targets.collect {
      case (s, f) if f > 0.0 && !have(s) => s
    }
    require(missing.isEmpty,
      s"targets with no token inventory: ${missing.mkString(", ")} — " +
        "the plan would under-run the budget by their fractions")
    import scala.jdk.CollectionConverters._
    tokenTotals.sparkSession.createDataFrame(rows.asJava, planned.schema)
  }

  /** (idCol, sourceCol, copy_idx) rows: doc replicated per its source's
    * weight. Sources absent from `weights` drop (weight 0). */
  def materialize(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], salt: String = ""): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1000.0),
      "weights must be in [0, 1000] — an implied-epochs mix, not a scale factor")
    val wt = element_at(typedlit(weights), col(sourceCol))
    expand(df.select(col(idCol), col(sourceCol),
      when(wt.isNotNull, copies(wt, col(idCol), salt)).otherwise(lit(0L))
        .as("__n")), idCol, sourceCol)
  }

  /** [[materialize]] with the weights as a TABLE — the form for mixes
    * too large for a plan literal (per-domain web weights can run to
    * millions of rows). One broadcast of the weights, still zero data
    * shuffles; the inner join drops unweighted sources like the map
    * form does. `weights` must carry (`sourceCol`, `wt`).
    *
    * The mix-sized validation pass enforces the map form's contract up
    * front: weights in [0, 1000] (a negative w would make copy counts
    * negative and rows silently vanish) and one row per source (a
    * duplicate source row would double its docs with IDENTICAL
    * copy_idx values — corrupting the one-row-per-(doc, copy) output
    * contract, not upweighting). */
  def materializeFromTable(df: DataFrame, idCol: String, sourceCol: String,
      weights: DataFrame, salt: String = ""): DataFrame = {
    val s = weights.agg(
      count(lit(1)).as("n"), countDistinct(col(sourceCol)).as("nd"),
      count(col("wt")).as("nw"),
      min(col("wt")).as("mn"), max(col("wt")).as("mx")).head()
    require(s.getLong(0) == s.getLong(1),
      s"weights carry duplicate '$sourceCol' rows — one weight per source")
    // min/max skip nulls, so a NULL wt would sail past the range check
    // and then silently drop its source's documents (null __n filters
    // out) — the exact silent-loss mode the range require exists to stop
    require(s.getLong(0) == s.getAs[Long]("nw"),
      "weights carry NULL wt rows — every source needs an explicit weight")
    require(s.getLong(0) == 0L ||
        (s.getAs[Double]("mn") >= 0.0 && s.getAs[Double]("mx") <= 1000.0),
      "weights must be in [0, 1000] — an implied-epochs mix, not a scale factor")
    expand(df.join(broadcast(weights), Seq(sourceCol))
      .select(col(idCol), col(sourceCol),
        copies(col("wt"), col(idCol), salt).as("__n")), idCol, sourceCol)
  }

  /** floor(w) + the fractional portable-hash draw — the per-row copy
    * count both entry points share. The threshold ROUNDS (both engines'
    * round, not Spark-cast truncation vs DuckDB-cast rounding): frac·10⁶
    * for an arbitrary double weight (q93 output epochs are arbitrary)
    * is generally not binary-exact, and truncating here while the
    * oracle rounds would diverge on the boundary hash value. */
  private def copies(wt: Column, id: Column, salt: String): Column = {
    val hb = PortableHash.h60(PortableHash.saltedKey(id, salt)) % 1000000L
    floor(wt).cast("long") +
      when(hb < round((wt - floor(wt)) * 1000000d).cast("long"), 1L)
        .otherwise(0L)
  }

  private def expand(counted: DataFrame, idCol: String,
      sourceCol: String): DataFrame =
    counted.filter(col("__n") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(0L), col("__n") - 1)).as("copy_idx"))

  /** The DuckDB mirror of one [[materialize]] weight row, for oracle-SQL
    * generation: the admission hash over the identical key encoding. */
  def sqlAdmissionHash(idExpr: String, salt: String): String =
    s"(${PortableHash.sqlH60(PortableHash.sqlSaltedKey(idExpr, salt))} % 1000000)"
}
