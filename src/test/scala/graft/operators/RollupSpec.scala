package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private val spec = Rollup.Spec(
    keys = Seq("o_orderpriority"),
    sums = Seq("o_totalprice"),
    mins = Seq("o_orderdate"),
    maxs = Seq("o_orderdate"))

  test("init + folds ≡ from-scratch build, exactly") {
    val store = scratch("rollup")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val batches = (0 to 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))

    Rollup.init(spark, store, batches(0), spec)
    Rollup.fold(spark, store, batches(1), spec)
    Rollup.fold(spark, store, batches(2), spec)

    val got = Rollup.finalized(Rollup.read(spark, store), spec)
      .collect().map(_.toSeq).toSet
    val want = Rollup.finalized(Rollup.state(orders, spec), spec)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)

    // the standing state is group-count-sized, not corpus-sized
    assert(Rollup.read(spark, store).count() ===
      orders.select("o_orderpriority").distinct().count())
  }

  test("fold order does not change the result (decimal sums)") {
    val store1 = scratch("rollup-a")
    val store2 = scratch("rollup-b")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val b = (0 to 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))

    Rollup.init(spark, store1, b(0), spec)
    Rollup.fold(spark, store1, b(1), spec)
    Rollup.fold(spark, store1, b(2), spec)
    Rollup.init(spark, store2, b(2), spec)
    Rollup.fold(spark, store2, b(0), spec)
    Rollup.fold(spark, store2, b(1), spec)

    assert(Rollup.read(spark, store1).collect().map(_.toSeq).toSet ===
      Rollup.read(spark, store2).collect().map(_.toSeq).toSet)
  }

  test("ndv sketch state: fold ≡ from-scratch estimate, within 3σ of exact") {
    val store = scratch("rollup-ndv")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val nspec = Rollup.Spec(keys = Seq("o_orderpriority"),
      ndvs = Seq("o_custkey"))
    val b = (0 to 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))

    Rollup.init(spark, store, b(0), nspec)
    Rollup.fold(spark, store, b(1), nspec)
    Rollup.fold(spark, store, b(2), nspec)

    // register-max merge at one lgK: the folded sketch must estimate
    // exactly what the single-pass sketch over the union estimates
    val folded = Rollup.finalized(Rollup.read(spark, store), nspec)
      .select("o_orderpriority", "ndv__o_custkey")
      .as[(String, Long)].collect().toMap
    val scratchEst = Rollup.finalized(Rollup.state(orders, nspec), nspec)
      .select("o_orderpriority", "ndv__o_custkey")
      .as[(String, Long)].collect().toMap
    assert(folded === scratchEst)

    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("x"))
      .as[(String, Long)].collect().toMap
    assert(folded.keySet === exact.keySet)
    folded.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) <= math.max(1L, (exact(k) * 0.05).toLong),
        s"group $k: estimate $est vs exact ${exact(k)}")
    }
  }

  test("hist state: fold ≡ scratch bit-exact; quantile within one bin width") {
    val store = scratch("rollup-hist")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val h = Rollup.HistSpec("o_totalprice", 0.0, 600000.0, 60)
    val hspec = Rollup.Spec(keys = Seq("o_orderpriority"), hists = Seq(h))
    val b = (0 to 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))

    Rollup.init(spark, store, b(0), hspec)
    Rollup.fold(spark, store, b(1), hspec)
    Rollup.fold(spark, store, b(2), hspec)

    // long-sum bins: the folded state must equal the single-pass state
    val folded = Rollup.read(spark, store).collect().map(_.toSeq).toSet
    val scr = Rollup.state(orders, hspec).collect().map(_.toSeq).toSet
    assert(folded === scr)

    val est = Rollup.read(spark, store)
      .select(col("o_orderpriority"),
        Rollup.histQuantile(h, 0.5).as("p50"))
      .as[(String, Double)].collect().toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("x"))
      .as[(String, Double)].collect().toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= h.width,
        s"group $k: est $e vs exact ${exact(k)} (width ${h.width})")
    }
  }

  test("hist quantile edge cases: empty group NULL, single value, clamping") {
    val h = Rollup.HistSpec("x", 0.0, 10.0, 10)
    val hspec = Rollup.Spec(keys = Seq("k"), hists = Seq(h))
    val df = Seq(("a", Some(3.2)), ("a", Some(3.9)),
      ("b", Option.empty[Double]),        // all-null group
      ("c", Some(-5.0)), ("c", Some(99.0)) // out of range: clamps
    ).toDF("k", "x")
    val st = Rollup.state(df, hspec)
    val q = st.select(col("k"), Rollup.histQuantile(h, 0.5).as("p50"))
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(q("a") === Some(3.5))  // both in bin [3,4) → midpoint
    assert(q("b") === None)       // no non-null values → NULL
    // clamped values land in the edge bins (midpoints 0.5 and 9.5)
    assert(q("c") === Some(0.5))  // k=1 of 2 → first bin
  }

  test("hist hostile values: huge outliers clamp (no ANSI overflow), NaN counts nowhere") {
    val h = Rollup.HistSpec("x", 0.0, 100.0, 100) // width 1
    val hspec = Rollup.Spec(keys = Seq("k"), hists = Seq(h))
    val df = Seq(("a", 3.0e9),          // raw bin 3e9 > Int.MaxValue
      ("a", Double.PositiveInfinity),   // clamps into the top bin
      ("a", Double.NaN),                // floor(NaN)=0 would inflate bin 0
      ("a", 50.0)).toDF("k", "x")
    val st = Rollup.state(df, hspec).collect()(0)
    // would have thrown CAST_OVERFLOW under ANSI before the long clamp
    assert(st.getAs[Long]("h99__x") === 2L) // 3e9 + Inf, both edge-clamped
    assert(st.getAs[Long]("h50__x") === 1L)
    assert(st.getAs[Long]("h0__x") === 0L)  // NaN excluded, not bin 0
    assert((0 until 100).map(i => st.getAs[Long](s"h${i}__x")).sum === 3L)
  }

  test("duplicate measure/hist columns are rejected at Spec construction") {
    val e = intercept[IllegalArgumentException] {
      Rollup.Spec(keys = Seq("k"), hists = Seq(
        Rollup.HistSpec("x", 0, 100, 10), Rollup.HistSpec("x", 0, 1000, 20)))
    }
    assert(e.getMessage.contains("hists") && e.getMessage.contains("x"))
    val e2 = intercept[IllegalArgumentException] {
      Rollup.Spec(keys = Seq("k"), sums = Seq("x", "x"))
    }
    assert(e2.getMessage.contains("sums"))
  }

  test("new keys appear; null measures count into n_rows but not avg") {
    val store = scratch("rollup-nulls")
    val s2 = Rollup.Spec(keys = Seq("k"), sums = Seq("x"))
    Rollup.init(spark, store,
      Seq(("a", Some(1.0)), ("a", None)).toDF("k", "x"), s2)
    Rollup.fold(spark, store,
      Seq(("b", Option.empty[Double])).toDF("k", "x"), s2)

    val rows = Rollup.finalized(Rollup.read(spark, store), s2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    // "a": 2 rows, one non-null → avg over 1, not 2
    assert(rows("a") === ((2L, Some(1.0), Some(1.0))))
    // "b": all-null measure → null sum and avg, but the row count holds
    assert(rows("b") === ((1L, None, None)))
  }

  test("variance state: fold ≡ scratch; matches exact var_pop; vars need sums") {
    val store = scratch("rollup-var")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val vspec = Rollup.Spec(keys = Seq("o_orderpriority"),
      sums = Seq("o_totalprice"), vars = Seq("o_totalprice"))
    val b = (0 to 2).map(i =>
      orders.filter(pmod(col("o_orderkey"), lit(3)) === i))
    Rollup.init(spark, store, b(0), vspec)
    Rollup.fold(spark, store, b(1), vspec)
    Rollup.fold(spark, store, b(2), vspec)

    // decimal sum-of-squares state: folded ≡ scratch bit-for-bit,
    // so the derived var/stddev agree exactly too
    val folded = Rollup.finalized(Rollup.read(spark, store), vspec)
      .select("o_orderpriority", "var__o_totalprice", "stddev__o_totalprice")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val scr = Rollup.finalized(Rollup.state(orders, vspec), vspec)
      .select("o_orderpriority", "var__o_totalprice", "stddev__o_totalprice")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(folded === scr)

    // against exact var_pop over the DECIMAL(18,2)-rounded values (the
    // state's precision contract): relative agreement, not bit equality
    // (Spark's var_pop streams in double)
    val exact = orders.groupBy("o_orderpriority")
      .agg(var_pop(col("o_totalprice").cast("decimal(18,2)")).as("v"))
      .as[(String, Double)].collect().toMap
    assert(folded.keySet === exact.keySet)
    folded.foreach { case (k, (v, sd)) =>
      assert(math.abs(v - exact(k)) <= math.abs(exact(k)) * 1e-9,
        s"group $k: var $v vs var_pop ${exact(k)}")
      assert(math.abs(sd - math.sqrt(v)) < 1e-12)
    }

    // a var column without its sum state is rejected up front
    val ex = intercept[IllegalArgumentException] {
      Rollup.Spec(keys = Seq("k"), sums = Seq("a"), vars = Seq("b"))
    }
    assert(ex.getMessage.contains("b"))
  }

  test("commits are versioned: previous state stays readable") {
    val store = scratch("rollup-tt")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val b0 = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
    val b1 = orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)

    Rollup.init(spark, store, b0, spec)
    Rollup.fold(spark, store, b1, spec)

    val versions = Merge.snapshotVersions(spark, store)
    assert(versions.size === 2)
    val prev = Merge.readSnapshotAt(spark, store, versions.head)
    assert(prev.collect().map(_.toSeq).toSet ===
      Rollup.state(b0, spec).collect().map(_.toSeq).toSet)
    assert(Merge.readSnapshotAt(spark, store, versions.last)
      .agg(sum("n_rows")).head().getLong(0) === orders.count())
  }

  test("audit: a healthy store reports nothing; a corrupted fold is localized") {
    val store = scratch("rollup-audit")
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val full = Rollup.Spec(keys = Seq("o_orderpriority"),
      sums = Seq("o_totalprice"), mins = Seq("o_orderdate"),
      maxs = Seq("o_orderdate"), ndvs = Seq("o_custkey"),
      hists = Seq(Rollup.HistSpec("o_totalprice", 0.0, 500000.0, 8)))
    Rollup.init(spark, store,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), full)
    Rollup.fold(spark, store,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), full)
    // clean: the standing state IS the from-scratch state, bit for bit
    assert(Rollup.audit(spark, store, orders, full).count() === 0)

    // double-fold one slice (the corruption re-delivery tags prevent):
    // the audit localizes the damaged groups on both sides
    Rollup.fold(spark, store,
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), full)
    val bad = Rollup.audit(spark, store, orders, full)
    assert(bad.count() > 0)
    assert(bad.select("side").distinct().as[String].collect().toSet ===
      Set("standing", "scratch"))
  }

  test("spec sidecar: init persists it, readSpec round-trips, fold self-heals") {
    val store = scratch("rollup-sidecar")
    val full = Rollup.Spec(keys = Seq("k"), sums = Seq("x", "y"),
      mins = Seq("x"), maxs = Seq("y"), ndvs = Seq("k"),
      hists = Seq(Rollup.HistSpec("x", -1.5, 8.5, 4)), vars = Seq("x"))
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("k", "x", "y")
    Rollup.init(spark, store, df, full)
    // exact round-trip, histogram edges included (the part the state
    // schema cannot encode — what graft_rollup/graft_card SQL needs)
    assert(Rollup.readSpec(spark, store) === Some(full))
    // a deleted/torn sidecar is restored by the next fold
    val p = new java.io.File(store, "_graft_spec.json")
    assert(p.delete())
    assert(Rollup.readSpec(spark, store) === None)
    Rollup.fold(spark, store, df, full)
    assert(Rollup.readSpec(spark, store) === Some(full))
    // and the sidecar never trips the layout guard or GC: more folds
    // (which run the preamble GC) keep committing fine
    Rollup.fold(spark, store, df, full)
    assert(Rollup.readSpec(spark, store) === Some(full))
  }
}
