package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** The native H60Hash kernel must be bit-identical to the SQL chain
  * `conv(substring(md5(s), 1, 15), 16, 10)` it replaced — that chain is
  * what the DuckDB oracle mirrors, so this equivalence IS the
  * cross-engine portability proof for every portable-hash query
  * (q19/q20/q91/q97/q99/q102). */
object H60Properties extends Properties("h60") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("√", "é", "中", "🙂", "a", " ", "\t"))
      .map(_.mkString),
    Gen.const(""))

  property("native kernel == conv(substring(md5)) chain") =
    Prop.forAll(Gen.listOfN(20, strGen)) { strs =>
      import spark.implicits._
      val df = strs.toDF("s")
      val rows = df.select(
          PortableHash.h60(col("s")).as("native"),
          conv(substring(md5(col("s").cast("string")), 1, 15), 16, 10)
            .cast("long").as("sql"))
        .as[(Long, Long)].collect()
      rows.forall { case (a, b) => a == b }
    }

  property("matches the plan-time scala evaluation h60s") =
    Prop.forAll(Gen.listOfN(20, strGen)) { strs =>
      import spark.implicits._
      val viaSpark = strs.toDF("s")
        .select(PortableHash.h60(col("s"))).as[Long].collect().toSeq
      viaSpark == strs.map(PortableHash.h60s)
    }
}
