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

  /** `k` rows per group, inclusion odds ∝ `weightCol` (must be a
    * FINITE value > 0 — non-positive, NULL and NaN weights are
    * excluded; "weight 0 means never sampled", and Spark orders NaN
    * ABOVE every number, so an unfiltered NaN weight would both pass
    * `> 0` and then monopolize every sample slot: pow(u, 1/NaN) = NaN
    * sorts as the largest A-ES key), rank appended as `rankCol`. */
  def weightedPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int, salt: String = "",
      rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (PortableHash.h60(PortableHash.saltedKey(col(idCol), salt))
      .cast("double") + 0.5) / math.pow(2.0, 60).toLong.toDouble
    val w = col(weightCol).cast("double")
    val keyed = df.filter(w > 0 && !isnan(w))
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
