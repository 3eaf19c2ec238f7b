package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/**
 * Deterministic weighted sampling without replacement, per group —
 * Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5), 2006): each
 * row draws `key = u^(1/w)` with `u ~ U(0,1)` and the k largest keys
 * per group are the sample; inclusion probability is proportional to
 * weight, exactly the "sample high-quality documents harder" knob a
 * curriculum/mixture pipeline wants where [[Mixing]] replicates and
 * [[DatasetSplit]] assigns unweighted.
 *
 * The uniform draw is the PORTABLE id hash ((h60(id:salt)+0.5)/2⁶⁰ —
 * never `rand()`), the [[DatasetSplit]] discipline: the sample is a
 * pure function of (id, salt), reproducible across runs, engines,
 * partitionings and re-ingestions, and re-drawable by salt. The
 * top-k-per-group runs on the bounded-heap
 * [[graft.plans.TopKPerGroup]] operator — one shuffle of
 * (group, key)-projected rows, no full per-partition sort.
 */
object Sampling {

  /** `k` rows per group, inclusion odds ∝ `weightCol` (must be > 0 —
    * non-positive-weight rows are excluded, matching "weight 0 means
    * never sampled"), rank appended as `rankCol`. */
  def weightedPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int, salt: String = "",
      rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (PortableHash.h60(PortableHash.saltedKey(col(idCol), salt))
      .cast("double") + 0.5) / math.pow(2.0, 60).toLong.toDouble
    val keyed = df.filter(col(weightCol) > 0)
      .withColumn("__es_key",
        pow(u, lit(1.0) / col(weightCol).cast("double")))
    TopK.perGroup(keyed, groupCols,
        Seq(("__es_key", false), (idCol, true)), k, rankCol)
      .drop("__es_key")
  }

  /** DuckDB mirror of the A-ES key for oracle-SQL generation. */
  def sqlEsKey(idExpr: String, weightExpr: String, salt: String): String =
    s"pow((${PortableHash.sqlH60(PortableHash.sqlSaltedKey(idExpr, salt))}" +
      s" + 0.5) / 1152921504606846976.0, 1.0 / CAST($weightExpr AS DOUBLE))"
}
