package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.SparkSpec

/** The 64-bit hash-key mode must agree with the string-key mode on
  * random corpora (a disagreement requires an xxhash64 collision, which
  * could only over-flag — never un-flag — and is ~2⁻⁶⁵ per pair). The
  * generator draws tokens from a small vocabulary so repeated passages
  * actually occur, within and across documents. */
object PassageProperties extends Properties("passagededup") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield toks.mkString(" ")

  property("hash-key stats equal string-key stats on random corpora") =
    Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def res(hashKey: Boolean) =
        PassageDedup.stats(df, "doc_id", "text", w = 2, hashKey = hashKey)
          .as[(Long, Long, Long, Double)].collect().toSet
      res(hashKey = true) == res(hashKey = false)
    }
}
