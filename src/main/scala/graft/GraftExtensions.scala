package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expressions.{DotProduct, LongArrayMatchCount, MinHashSigAgg, SimHashSigAgg}

/**
 * Session-extension entry point: registers the engine's native
 * expressions for pure-SQL users via
 * `spark.sql.extensions=graft.GraftExtensions` (no code access needed).
 * Programmatic sessions can use [[graft.functions.GraftFunctions.register]]
 * instead — both expose the same functions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
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
  }
}
