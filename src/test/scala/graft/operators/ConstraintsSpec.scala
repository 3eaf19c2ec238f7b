package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The constraint report must count exactly the violating rows per
  * check (nulls pass range/set/ref — nullability is NotNull's job),
  * the row flags must name exactly the failed checks, and the split
  * must partition losslessly. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  // (k, qty, flag, ref): one null qty, one out-of-range, one bad flag,
  // one dangling ref, one duplicated key
  private lazy val rows = Seq(
    (1L, Some(10.0), "A", Some(100L)),
    (2L, None, "N", Some(100L)),          // null qty: passes in_range
    (3L, Some(99.0), "R", Some(200L)),    // out of range
    (4L, Some(20.0), "X", Some(200L)),    // bad flag
    (5L, Some(30.0), "A", Some(999L)),    // dangling ref
    (5L, Some(40.0), "N", None)           // dup key; null ref passes
  ).toDF("k", "qty", "flag", "ref")

  private lazy val dim = Seq(100L, 200L).toDF("id")

  private lazy val checks = Seq(
    Constraints.NotNull("qty"),
    Constraints.InRange("qty", 0.0, 50.0),
    Constraints.InSet("flag", Seq("A", "N", "R")),
    Constraints.Predicate("k_positive", col("k") > 0),
    Constraints.Unique(Seq("k")),
    Constraints.Ref("ref", dim, "id"))

  test("report counts violations per check in one pass + bounded jobs") {
    val got = Constraints.report(spark, rows, checks)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("in_range(qty)", 1L, 6L, false),
      ("in_set(flag)", 1L, 6L, false),
      ("k_positive", 0L, 6L, true),
      ("not_null(qty)", 1L, 6L, false),
      ("ref(ref->id)", 1L, 6L, false),
      ("unique(k)", 2L, 6L, false)))
  }

  test("flagRows names exactly the failed row-level checks; split is lossless") {
    val flagged = Constraints.flagRows(rows, checks)
      .select(col("k"), col("qty"), col("violated"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](2).sorted)).toSeq
    assert(flagged.count(_._2.isEmpty) === 3) // rows 1, 5a, 5b clean
    assert(flagged.find(_._1 == 2L).get._2 === Seq("not_null(qty)"))
    assert(flagged.find(_._1 == 3L).get._2 === Seq("in_range(qty)"))
    assert(flagged.find(_._1 == 4L).get._2 === Seq("in_set(flag)"))

    val (clean, bad) = Constraints.split(rows, checks)
    assert(clean.count() + bad.count() === rows.count())
    assert(clean.columns.toSeq === rows.columns.toSeq) // unchanged
    assert(bad.columns.contains("violated"))
    // a multi-failure row carries every failed name
    val multi = Constraints.flagRows(
      Seq((0L, Some(-1.0), "Z", Option.empty[Long]))
        .toDF("k", "qty", "flag", "ref"), checks)
      .select("violated").as[Seq[String]].head().sorted
    assert(multi === Seq("in_range(qty)", "in_set(flag)", "k_positive"))
  }

  test("empty input reports zero violations for every check (no NPE)") {
    val got = Constraints.report(spark, rows.limit(0), checks)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length === checks.length)
    assert(got.forall { case (_, v, n, p) => v === 0L && n === 0L && p })
  }

  test("flagRows is expression-only: no exchange in the plan") {
    val plan = Constraints.flagRows(rows, checks)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }
}
