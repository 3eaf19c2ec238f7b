package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** ScalaCheck properties of the PSI statistic as the OPERATOR computes
  * it (each sample is a Spark job — few samples):
  *  - symmetry: PSI(a, b) = PSI(b, a) (each bin term
  *    (pa−pb)·ln(pa/pb) is swap-invariant);
  *  - non-negativity: sign(pa−pb) = sign(ln(pa/pb)) per bin, so the
  *    sum cannot go negative;
  *  - identity: PSI(a, a) = 0 exactly (every term is exactly 0.0 —
  *    no float residue to round away).
  */
object DriftProperties extends Properties("drift") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val h = Rollup.HistSpec("x", 0.0, 10.0, 8)

  private val sampleGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-2.0, 12.0)) // incl. clamped tails

  private def df(rows: List[Double]) = {
    import spark.implicits._
    rows.map(v => ("g", v)).toDF("k", "x")
  }

  private def psiOf(a: List[Double], b: List[Double]): Double = {
    import spark.implicits._
    Drift.psi(df(a), df(b), Seq("k"), h).select("psi").as[Double].head()
  }

  property("symmetric and non-negative") =
    Prop.forAll(sampleGen, sampleGen) { (a, b) =>
      val ab = psiOf(a, b)
      val ba = psiOf(b, a)
      ab == ba && ab >= 0.0
    }

  property("identical distributions read exactly zero") =
    Prop.forAll(sampleGen) { a => psiOf(a, a) == 0.0 }
}
