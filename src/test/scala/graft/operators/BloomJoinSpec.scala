package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Bloom pre-join: exactness vs the plain join, and actual pre-shuffle
  * selectivity of the bloom predicate. */
class BloomJoinSpec extends SparkSpec {

  private lazy val fact = Tables.load(spark, sf0001, "lineitem")
    .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
  private lazy val dim = Tables.load(spark, sf0001, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"), col("o_orderdate"))

  test("empty dim: null bloom short-circuits to an empty join, not an analysis error") {
    val emptyDim = dim.filter(col("o_orderkey") < 0)
    assert(BloomJoin.prefilteredJoin(fact, emptyDim, "o_orderkey", 100L).count() === 0L)
  }

  test("prefilteredJoin is exact: same rows as the plain join") {
    val got = BloomJoin.prefilteredJoin(fact, dim, "o_orderkey", 10000L)
      .groupBy("o_orderkey").count()
    val want = fact.join(dim, "o_orderkey").groupBy("o_orderkey").count()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("bloom predicate filters most non-matching fact rows pre-shuffle") {
    val bloom = BloomJoin.keyBloom(dim, "o_orderkey", 10000L)
    val factN = fact.count()
    val trueN = fact.join(dim.select("o_orderkey").distinct(), "o_orderkey").count()
    val keptN = fact.filter(BloomJoin.mightContain(bloom, col("o_orderkey"))).count()
    // everything that should survive does; false positives stay small
    assert(keptN >= trueN)
    assert(keptN <= trueN + math.max(10L, (factN - trueN) / 10))
    assert(keptN < factN) // it actually filtered something
  }
}
