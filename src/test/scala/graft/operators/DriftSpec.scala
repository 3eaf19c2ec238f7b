package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** PSI must read ~0 for identical distributions, grow monotonically
  * with shift, agree between the direct path and standing rollup
  * states, and stay finite on empty bins (Laplace smoothing). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val h = Rollup.HistSpec("x", 0.0, 10.0, 10)

  private def df(rows: Seq[Double]) =
    rows.map(v => ("g", v)).toDF("k", "x")

  private def psiOf(a: Seq[Double], b: Seq[Double]): Double =
    Drift.psi(df(a), df(b), Seq("k"), h).select("psi").as[Double].head()

  test("identical ≈ 0; shift grows PSI; empty bins stay finite") {
    val base = (0 until 1000).map(i => (i % 10) + 0.5)
    assert(math.abs(psiOf(base, base)) < 1e-9)

    val mild = (0 until 1000).map(i => (i % 10) * 0.8 + 1.5)
    val wild = (0 until 1000).map(_ => 9.5)
    val pMild = psiOf(base, mild)
    val pWild = psiOf(base, wild)
    assert(pMild > 0.01, s"mild=$pMild")
    assert(pWild > pMild * 2, s"wild=$pWild vs mild=$pMild")
    assert(!pWild.isInfinite && !pWild.isNaN) // 9 empty bins, smoothed
  }

  test("standing rollup states give the same PSI as the direct path") {
    val a = (0 until 600).map(i => (i % 10) + 0.2)
    val b = (0 until 600).map(i => (i % 7) + 0.7)
    val direct = psiOf(a, b)

    // build each side as an incrementally-folded rollup store
    val spec = Rollup.Spec(keys = Seq("k"), hists = Seq(h))
    def store(rows: Seq[Double], name: String): String = {
      val dir = Files.createTempDirectory(name).toString + "/rollup"
      val (h1, h2) = rows.splitAt(rows.size / 3)
      Rollup.init(spark, dir, df(h1), spec)
      Rollup.fold(spark, dir, df(h2), spec)
      dir
    }
    val fromStates = Drift.psiFromStates(
        Rollup.read(spark, store(a, "drift-a")),
        Rollup.read(spark, store(b, "drift-b")),
        Seq("k"), h)
      .select("psi").as[Double].head()
    assert(fromStates === direct)
  }

  test("keys named like internal temporaries don't collide (r6 advice)") {
    // a grouping key named `a0` used to collide with the bare bin
    // temporaries; with the __psi_ namespace it's just a key
    def dfk(rows: Seq[Double]) = rows.map(v => ("g", v)).toDF("a0", "x")
    val base = (0 until 400).map(i => (i % 10) + 0.5)
    val shifted = (0 until 400).map(i => (i % 5) + 0.5)
    val out = Drift.psi(dfk(base), dfk(shifted), Seq("a0"), h)
    assert(out.columns.toSeq === Seq("a0", "n_a", "n_b", "psi"))
    assert(out.count() === 1)

    // reserved output names are rejected loudly, not silently joined
    def dfr(rows: Seq[Double]) = rows.map(v => ("g", v)).toDF("n_a", "x")
    val ex = intercept[IllegalArgumentException] {
      Drift.psi(dfr(base), dfr(shifted), Seq("n_a"), h)
    }
    assert(ex.getMessage.contains("n_a"))
  }
}
