package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expressions.{DotProduct, LongArrayMatchCount, MinHashSigAgg, SimHashSigAgg}
import graft.plans.{RankLimitRewrite, TopKPerGroupStrategy}

/**
 * Session-extension entry point: registers the engine's native
 * expressions for pure-SQL users via
 * `spark.sql.extensions=graft.GraftExtensions` (no code access needed),
 * plus the whole-operator top-k-per-group extension: the
 * [[graft.plans.RankLimitRewrite]] optimizer rule turns
 * `Filter(row_number <= k, Window)` into [[graft.plans.TopKPerGroupNode]]
 * and the injected strategy plans it. Programmatic sessions can use
 * [[graft.functions.GraftFunctions.register]] / [[graft.operators.TopK]]
 * instead — same functions, same operator.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RankLimitRewrite)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_match_count"),
      new ExpressionInfo(classOf[LongArrayMatchCount].getName, "graft_match_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongArrayMatchCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "graft_minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSigAgg(exprs(0), exprs(1).eval().asInstanceOf[Int])
          .toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("graft_simhash_sig"),
      new ExpressionInfo(classOf[SimHashSigAgg].getName, "graft_simhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashSigAgg(exprs(0)).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1).eval().asInstanceOf[Number].longValue).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
  }
}
