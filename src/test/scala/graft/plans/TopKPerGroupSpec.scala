package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TopK
import graft.sources.Tables

/** The whole-operator top-k-per-group extension: result parity with the
  * Window idiom, bounded-heap plan shape, and the optimizer rewrite. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = Tables.load(spark, sf0001, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("o_custkey", "o_orderkey", "rk").as[(Long, Long, Int)].collect().toSet

  test("perGroup matches the row_number window form exactly") {
    val got = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), k = 3, rankName = "rk")
    assert(rows(got) === rows(windowForm(3)))
    assert(got.columns.toSeq ===
      Seq("o_custkey", "o_orderkey", "o_totalprice", "rk"))
  }

  test("a rankName colliding with an input column is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(orders.withColumn("rk", lit(1)), Seq("o_custkey"),
        Seq(("o_totalprice", false)), k = 1, rankName = "rk")
    }
    assert(e.getMessage.contains("rk"))
  }

  test("plan uses TopKPerGroupExec with no Sort or Window operator") {
    val got = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false)), k = 2)
    val physical = got.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroup"), physical)
    assert(!physical.contains("WindowExec"), physical)
    assert(!physical.toLowerCase.contains("sort"), physical)
  }

  test("empty group list = global top-k (AllTuples)") {
    val got = TopK.perGroup(orders, Nil, Seq(("o_totalprice", false),
      ("o_orderkey", true)), k = 5)
    val top = got.orderBy(col("rank")).select("o_orderkey").as[Long].collect()
    val expected = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).select("o_orderkey").as[Long].collect()
    assert(top.toSeq === expected.toSeq)
  }

  test("RankLimitRewrite turns Filter(rn <= k, Window) into TopKPerGroupNode") {
    val analyzed = windowForm(3).queryExecution.analyzed
    val rewritten = RankLimitRewrite(analyzed)
    val nodes = rewritten.collect { case n: TopKPerGroupNode => n }
    assert(nodes.size === 1, rewritten.toString)
    assert(nodes.head.k === 3)
    // output contract preserved: same attributes, same exprIds
    assert(rewritten.output.map(_.exprId) === analyzed.output.map(_.exprId))
  }

  test("RankLimitRewrite keeps non-rank conjuncts as a residual Filter") {
    val filtered = windowForm(3).filter(col("o_totalprice") > 1000)
    val rewritten = RankLimitRewrite(filtered.queryExecution.analyzed)
    val topk = rewritten.collect { case n: TopKPerGroupNode => n }
    assert(topk.size === 1)
    val residual = rewritten.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
    assert(residual.nonEmpty, rewritten.toString)
  }

  test("RankLimitRewrite leaves rank() / non-row_number windows alone") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    val rankForm = orders.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    val rewritten = RankLimitRewrite(rankForm.queryExecution.analyzed)
    assert(rewritten.collect { case n: TopKPerGroupNode => n }.isEmpty)
  }
}
