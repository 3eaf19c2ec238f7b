package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Expression, SortOrder}
import org.apache.spark.sql.graft.PlanBridge

import graft.plans.{TopKPerGroupNode, TopKPerGroupStrategy}

/**
 * Programmatic entry point for the whole-operator top-k-per-group
 * extension (graft.plans.TopKPerGroup): "the k best rows of each group"
 * without the Window path's full per-partition sort. Installs
 * [[graft.plans.TopKPerGroupStrategy]] on the session's experimental
 * strategies (idempotent); SQL users get the same operator through
 * `graft.GraftExtensions`' RankLimitRewrite instead.
 */
object TopK {

  /**
   * The `k` first rows per `groupCols` group under `orderBy`
   * ((column, ascending) pairs — give a unique tiebreak for
   * deterministic output, as with row_number), with their 1-based rank
   * appended as `rankName`.
   */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      rankName: String = "rank"): DataFrame = {
    // the rank attribute is APPENDED to the child's output — a name
    // already present would yield a duplicate-named result that only
    // fails at the caller's next ambiguous reference, far from here
    require(!df.columns.contains(rankName),
      s"input already has a '$rankName' column; pass a different rankName")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String) = analyzed.output.find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val g: Seq[Expression] = groupCols.map(attr)
    val o = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(spark,
      TopKPerGroupNode(g, o, k, TopKPerGroupNode.rankAttribute(rankName), analyzed))
  }
}
