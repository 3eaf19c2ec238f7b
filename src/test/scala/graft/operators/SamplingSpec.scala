package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weighted reservoir sampling must be a pure function of (id, salt),
  * favor heavy rows at the documented odds, exclude non-positive
  * weights, and re-draw under a new salt. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic, weight-monotone in expectation, zero-weight excluded") {
    // two weight classes: heavy rows 10× the light ones
    val rows = (1L to 400L).map(i =>
      (i, "g", if (i <= 100) 10.0 else 1.0)) :+ ((401L, "g", 0.0))
    val df = rows.toDF("id", "grp", "w")

    val s1 = Sampling.weightedPerGroup(df, Seq("grp"), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedPerGroup(df, Seq("grp"), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(s1 === s2)          // pure function of (id, salt)
    assert(!s1.contains(401L)) // zero weight: never sampled

    // heavy rows are 25% of the population but 10× the weight — they
    // must dominate the sample (E[share] ≈ 77%; allow wide slack)
    val heavy = s1.count(_ <= 100L)
    assert(heavy > 25, s"heavy=$heavy of 50")

    // a different salt re-draws: overlap strictly below identity
    val s3 = Sampling.weightedPerGroup(df, Seq("grp"), "id", "w", 50,
      salt = "redraw").select("id").as[Long].collect().toSet
    assert(s3 !== s1)
    assert((s1 & s3).size < 50)
  }

  test("NaN weights are excluded, never monopolize the sample") {
    // Spark orders NaN above every number, so an unfiltered NaN weight
    // passes `> 0` AND its A-ES key pow(u, 1/NaN) = NaN sorts first —
    // NaN rows would deterministically fill all k slots
    val rows = (1L to 20L).map(i => (i, "g", 1.0)) ++
      Seq((90L, "g", Double.NaN), (91L, "g", 0.0 / 0.0))
    val got = Sampling.weightedPerGroup(rows.toDF("id", "grp", "w"),
        Seq("grp"), "id", "w", 5)
      .select("id").as[Long].collect().toSet
    assert(got.size === 5)
    assert(!got.contains(90L) && !got.contains(91L))
  }

  test("per-group isolation and rank determinism") {
    val df = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b", 1.0))
      .toDF("id", "grp", "w")
    val got = Sampling.weightedPerGroup(df, Seq("grp"), "id", "w", 7)
    assert(got.groupBy("grp").count().as[(String, Long)]
      .collect().toMap === Map("a" -> 7L, "b" -> 7L))
    // ranks are 1..k within each group
    assert(got.filter(col("grp") === "a").select("rk")
      .as[Int].collect().sorted.toSeq === (1 to 7))
  }
}
