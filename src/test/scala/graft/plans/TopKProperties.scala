package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec
import graft.operators.TopK

/** Property: the whole-operator TopKPerGroup is bit-identical to the
  * row_number window idiom on arbitrary (skewed, tied, small-group)
  * data and arbitrary k. Few samples — each is a Spark job. */
object TopKProperties extends Properties("topk") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // skewed groups (few hot keys), duplicate values to exercise ties
  private val rowGen: Gen[(Int, Int, Int)] = for {
    g <- Gen.frequency(5 -> Gen.const(0), 3 -> Gen.chooseNum(1, 3), 2 -> Gen.chooseNum(4, 50))
    v <- Gen.chooseNum(0, 9) // heavy ties; unique id breaks them
    id <- Gen.chooseNum(0, 1000000)
  } yield (g, v, id)

  property("parity with the window idiom for random data and k") =
    Prop.forAll(Gen.listOfN(200, rowGen), Gen.chooseNum(1, 6)) { (rows, k) =>
      import spark.implicits._
      // unique tiebreak (id) — required for determinism in BOTH forms
      val df = rows.distinct.toDF("g", "v", "id")
      val got = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), k, "rk")
        .select("g", "v", "id", "rk").as[(Int, Int, Int, Int)].collect().toSet
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val want = df.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
        .select("g", "v", "id", "rk").as[(Int, Int, Int, Int)].collect().toSet
      got == want
    }
}
