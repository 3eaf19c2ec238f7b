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
        graft.functions.GraftFunctions.arity("graft_dot", exprs, 2)(
          DotProduct(exprs(0), exprs(1)))))
    e.injectFunction((FunctionIdentifier("graft_match_count"),
      new ExpressionInfo(classOf[LongArrayMatchCount].getName, "graft_match_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_match_count", exprs, 2)(
          LongArrayMatchCount(exprs(0), exprs(1)))))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "graft_minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_minhash_sig", exprs, 2)(
          MinHashSigAgg(exprs(0),
            GraftExtensions.foldableIntArgExact("graft_minhash_sig", exprs, 1))
            .toAggregateExpression())))
    e.injectFunction((FunctionIdentifier("graft_simhash_sig"),
      new ExpressionInfo(classOf[SimHashSigAgg].getName, "graft_simhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_simhash_sig", exprs, 1)(
          SimHashSigAgg(exprs(0)).toAggregateExpression())))
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_bloom_agg", exprs, 2)(
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            exprs(0),
            GraftExtensions.foldableIntArg("graft_bloom_agg", exprs, 1).longValue)
            .toAggregateExpression())))
    e.injectFunction((FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[graft.functions.expressions.FreqItemsAgg].getName,
        "graft_freq_items"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_freq_items", exprs, 2)(
          graft.functions.expressions.FreqItemsAgg(exprs(0),
            GraftExtensions.foldableIntArgExact("graft_freq_items", exprs, 1))
            .toAggregateExpression())))
    e.injectFunction((FunctionIdentifier("graft_h60"),
      new ExpressionInfo(classOf[graft.functions.expressions.H60Hash].getName,
        "graft_h60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_h60", exprs, 1)(
          graft.functions.expressions.H60Hash(exprs(0)))))
    e.injectFunction((FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.arity("graft_might_contain", exprs, 2)(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            exprs(0), exprs(1)))))
    // snapshot reads (incl. time travel) as a table function:
    // SELECT * FROM graft_snapshot('/path'[, version])
    e.injectTableFunction((FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(graft.functions.GraftFunctions.getClass.getName,
        "graft_snapshot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.snapshotPlanBuilder(exprs)))
    // ops-surface table functions (round-7): standing-store serving
    // views and the data-contract report, for SQL-only sessions —
    // SELECT * FROM graft_rollup('/store') | graft_card('/store') |
    // graft_constraints('/tbl.parquet', 'not_null:id;unique:id')
    e.injectTableFunction((FunctionIdentifier("graft_rollup"),
      new ExpressionInfo(graft.functions.GraftFunctions.getClass.getName,
        "graft_rollup"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.rollupPlanBuilder(exprs)))
    e.injectTableFunction((FunctionIdentifier("graft_card"),
      new ExpressionInfo(graft.functions.GraftFunctions.getClass.getName,
        "graft_card"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.cardPlanBuilder(exprs)))
    e.injectTableFunction((FunctionIdentifier("graft_constraints"),
      new ExpressionInfo(graft.functions.GraftFunctions.getClass.getName,
        "graft_constraints"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GraftFunctions.constraintsPlanBuilder(exprs)))
  }
}

object GraftExtensions {
  /** Validated size/count argument for the SQL-registered aggregates
    * (round-2 advice): a non-foldable or non-integral argument used to
    * surface as a ClassCastException/NPE from inside the extension —
    * check up front and fail analysis with the function named, using
    * the same error conditions Spark's own bloom_filter_agg checks do. */
  private[graft] def foldableIntArg(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      pos: Int): Number = {
    import org.apache.spark.sql.AnalysisException
    if (exprs.size <= pos)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> fn, "expectedNum" -> (pos + 1).toString,
        "actualNum" -> exprs.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val e = exprs(pos)
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> fn, "paramName" -> s"argument ${pos + 1}",
        "paramType" -> "integer"))
    e.eval() match {
      // integral types ONLY — a Double/Decimal is also a Number and
      // would silently truncate (2.9 → 2; review finding)
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) =>
        n.asInstanceOf[java.lang.Number]
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> s"argument ${pos + 1}", "functionName" -> fn))
      case _ =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
          "parameter" -> s"argument ${pos + 1}", "functionName" -> fn,
          "invalidValue" -> e.sql))
    }
  }

  /** [[foldableIntArg]]'s string counterpart (the `graft_snapshot`
    * path argument): foldable, non-null, string-typed — anything else
    * fails analysis with the function named. */
  private[graft] def foldableStringArg(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      pos: Int): String = {
    import org.apache.spark.sql.AnalysisException
    val e = exprs(pos)
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> fn, "paramName" -> s"argument ${pos + 1}",
        "paramType" -> "string"))
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> s"argument ${pos + 1}", "functionName" -> fn))
      case _ =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.STRING", Map(
          "parameter" -> s"argument ${pos + 1}", "functionName" -> fn,
          "invalidValue" -> e.sql))
    }
  }

  /** [[foldableIntArg]] for Int-typed parameters: a BIGINT literal
    * outside Int range used to silently truncate through `.intValue` —
    * the same silent-coercion class the fractional check already rejects
    * (round-2 advice). Range-check before narrowing. */
  private[graft] def foldableIntArgExact(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      pos: Int): Int = {
    import org.apache.spark.sql.AnalysisException
    val l = foldableIntArg(fn, exprs, pos).longValue
    if (l < Int.MinValue || l > Int.MaxValue)
      throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
        "parameter" -> s"argument ${pos + 1}", "functionName" -> fn,
        "invalidValue" -> l.toString))
    l.toInt
  }
}
