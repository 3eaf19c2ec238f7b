package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus clustering over the embedding column — the organize-the-corpus
 * face of the same coarse quantizer [[Similarity.ivfTopK]] uses for
 * search: semantic domain discovery, per-cluster sampling quotas,
 * cluster-level dedup/mix decisions all start from "assign every
 * vector to its nearest center and profile the clusters".
 *
 * Assignment is the IVF shape exactly: k md5-picked centroids (the
 * bounded driver collect) ship as plan-time literals, so labeling is a
 * pure codegen'd map over the corpus — ZERO shuffle, embarrassingly
 * parallel at 100 TB; [[Similarity.trainCentroids]] slots in when
 * trained centers are wanted (its fp-order caveat applies — see q71).
 *
 * [[profile]] reduces to one k-row aggregate. The per-cluster mean
 * cosine accumulates in DECIMAL over 4-dp-rounded cosines: decimal
 * addition is exact and order-independent, so the mean is reproducible
 * across partitionings AND engines — the same determinism the float
 * sum would lose (q63's BigDecimal trick, aggregate-side).
 */
object Clustering {

  /** (vec_id, cluster_id, cos): nearest md5-picked centroid per vector,
    * cosine geometry (unit-normalized, dot = cosine). */
  def assign(corpus: DataFrame, k: Int): DataFrame = {
    val c = Similarity.unitVecs(corpus, "vec_id", "v")
    val centers = Similarity.hashPickCentroids(
      c.select(col("vec_id").as("item_id"), col("v").as("item_vec")), k)
    c.withColumn("best", array_max(Similarity.centScores(centers, col("v"))))
      .select(col("vec_id"), col("best").getField("lid").as("cluster_id"),
        col("best").getField("d").as("cos"))
  }

  /** Per-cluster profile: size, share of the corpus, exact-decimal mean
    * cosine-to-center (cohesion). */
  def profile(corpus: DataFrame, k: Int): DataFrame = {
    val a = assign(corpus, k)
    val total = sum(col("n")).over()
    a.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("cos"), 4).cast("decimal(18,6)")).as("s"))
      .select(col("cluster_id"), col("n"),
        round(col("n") / total.cast("double"), 4).as("share"),
        round(col("s").cast("double") / col("n"), 4).as("avg_cos"))
  }
}
