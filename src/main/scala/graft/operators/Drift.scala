package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution drift between two corpora (or two time-slices of one):
 * per-group Population Stability Index over fixed-bin histograms —
 * the monitoring metric a training-data pipeline watches to catch a
 * silently-shifting source mix before it reaches a model.
 *
 * PSI = Σ_bins (pA_i − pB_i) · ln(pA_i / pB_i), with Laplace
 * smoothing p_i = (c_i + 0.5) / (N + 0.5·bins) so empty bins are
 * defined and the statistic is DETERMINISTIC (no ε tuning). The usual
 * reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
 *
 * Scale shape: [[psi]] aggregates each side once ([[Rollup.state]] —
 * one map-combined shuffle each, state one narrow row per group), and
 * [[psiFromStates]] is the 100 TB path — it reads STANDING rollup
 * states (maintained incrementally by [[Rollup.fold]] /
 * [[graft.streaming.RollupStream]]), so a daily drift report costs a
 * group-count-sized join of two state tables and ZERO corpus scans.
 * The per-bin terms unroll into one codegen'd expression — no
 * explode, no second shuffle.
 */
object Drift {

  /** Per-group PSI from two histogram STATE tables (the
    * [[Rollup.state]]/[[Rollup.read]] layout for `h`): returns keys +
    * `n_a`/`n_b` (non-null counts) + `psi`, rounded to 6 decimals
    * (sum order across engines differs at ~1e-16; the round makes the
    * statistic hash-comparable). Groups present on only one side are
    * dropped (inner join): PSI against an absent distribution is
    * undefined — surface those via the states' own key sets.
    *
    * The intermediate bin columns live in a reserved `__psi_`
    * namespace so a grouping key named `a0`/`b3`/`n_a` cannot collide
    * with them; the only names keys must avoid are the three OUTPUT
    * columns (`n_a`, `n_b`, `psi`) and the `__psi_` prefix, enforced
    * up front. */
  def psiFromStates(stateA: DataFrame, stateB: DataFrame,
      keys: Seq[String], h: Rollup.HistSpec): DataFrame = {
    val reserved = Set("n_a", "n_b", "psi")
    require(keys.forall(k => !reserved(k) && !k.startsWith("__psi_")),
      s"grouping keys may not be named ${reserved.mkString("/")} or start " +
        s"with __psi_ (output/internal namespace); got: ${keys.mkString(", ")}")
    val bins = 0 until h.bins
    def side(st: DataFrame, tag: String) =
      st.select(keys.map(col) ++ bins.map(i =>
        col(s"h${i}__${h.col}").as(s"__psi_${tag}$i")): _*)
    val joined = side(stateA, "a").join(side(stateB, "b"), keys)
    val nA = bins.map(i => col(s"__psi_a$i")).reduce(_ + _)
    val nB = bins.map(i => col(s"__psi_b$i")).reduce(_ + _)
    def p(c: Column, n: Column) =
      (c.cast("double") + 0.5) / (n.cast("double") + 0.5 * h.bins)
    val psi = bins.map { i =>
      val pa = p(col(s"__psi_a$i"), col("__psi_na"))
      val pb = p(col(s"__psi_b$i"), col("__psi_nb"))
      (pa - pb) * log(pa / pb)
    }.reduce(_ + _)
    joined
      .withColumn("__psi_na", nA).withColumn("__psi_nb", nB)
      .select(keys.map(col) ++ Seq(
        col("__psi_na").as("n_a"), col("__psi_nb").as("n_b"),
        round(psi, 6).as("psi")): _*)
  }

  /** Per-group PSI between two datasets directly: aggregate each side
    * once, then [[psiFromStates]]. */
  def psi(a: DataFrame, b: DataFrame, keys: Seq[String],
      h: Rollup.HistSpec): DataFrame = {
    val spec = Rollup.Spec(keys = keys, hists = Seq(h))
    psiFromStates(Rollup.state(a, spec), Rollup.state(b, spec), keys, h)
  }
}
