package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import graft.functions.expressions.{DotProduct, LongArrayMatchCount}

/**
 * Registration of the engine's native Catalyst expressions as SQL
 * functions, and Column-API wrappers over them.
 *
 * `register(spark)` is idempotent and must run once per session (the
 * engine entry points — Verify/Bench/tests — all call it). The wrappers
 * resolve lazily via `call_function`, so Columns can be built before a
 * session exists.
 */
object GraftFunctions {

  val DotName   = "graft_dot"
  val MatchName = "graft_match_count"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(DotName,
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(MatchName,
      exprs => LongArrayMatchCount(exprs(0), exprs(1)), "built-in")
  }

  /** Codegen'd dot product (double) of two float/double arrays. */
  def graftDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Codegen'd count of agreeing positions in two long arrays. */
  def graftMatchCount(a: Column, b: Column): Column = call_function(MatchName, a, b)
}
