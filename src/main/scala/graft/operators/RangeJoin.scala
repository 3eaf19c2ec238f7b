package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (range) join without an equi key — the other join
 * shape Spark's planner turns into a broadcast-nested-loop.
 *
 * Scale path: discretize the range dimension into buckets of width `w`.
 * Each interval explodes onto every bucket it covers; each point lands
 * in exactly one bucket; the join becomes an EQUI join on the bucket id
 * plus a residual interval filter. Cost: |intervals| × avg-span/w extra
 * rows versus a full cross product — the standard interval-index
 * rewrite. A point matches an interval at most once (its single bucket),
 * so no dedup is needed.
 */
object RangeJoin {

  /**
   * @param points    point side
   * @param pointCol  numeric column joined into intervals
   * @param intervals interval side
   * @param startCol  inclusive lower bound column
   * @param endCol    exclusive upper bound column
   * @param bucketWidth bucket width; tune to the typical interval span
   */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val w = lit(bucketWidth)
    // empty/inverted intervals (end <= start) match no point under the
    // residual filter, so dropping them up front is an identity — and
    // it is LOAD-BEARING: sequence(a, b) with a > b generates a
    // DESCENDING range (default step -1), so one malformed row with a
    // large start and small end would explode into a ~|start-end|/w
    // element array and OOM its executor before the residual ever ran
    val loB = floor(col(startCol) / w).cast("long")
    // clamped to loB: an interval narrower than the epsilon would
    // otherwise still put the upper bucket below the lower one — any
    // non-empty interval covers at least its start's bucket
    val hiB = greatest(floor((col(endCol) - lit(1e-9)) / w).cast("long"), loB)
    val iBucketed = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(loB, hiB)))
    val pBucketed = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    pBucketed.join(iBucketed, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
