package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches the naive inequality join exactly") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.37)).toDF("pid", "v")
    val intervals = (0 until 30)
      .map(i => (i.toLong, i * 2.5, i * 2.5 + 4.0)) // overlapping spans
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        bucketWidth = 3.0)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val naive = points.join(intervals,
        $"v" >= $"lo" && $"v" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(fast.toSeq === naive.toSeq)
    assert(fast.nonEmpty)
  }

  test("interval boundaries: inclusive lower, exclusive upper") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "v")
    val intervals = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 5.0)
      .select("pid").as[Long].collect().toSeq
    assert(got === Seq(1L)) // 10.0 in, 20.0 out
  }

  test("malformed intervals never explode; sub-epsilon intervals still match") {
    val points = Seq((1L, 5.0), (2L, 1.0)).toDF("pid", "v")
    // an inverted interval (end << start): sequence(a, b) with a > b
    // DESCENDS by default, so unguarded this one row would generate a
    // ~1e9-element bucket array; it must instead match nothing
    val intervals = Seq(
      (1L, 1.0e9, 0.0),           // inverted → dropped, no explosion
      (2L, 5.0, 5.0),             // empty → matches nothing
      (3L, 1.0, 1.0 + 1e-12)      // narrower than the epsilon
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        bucketWidth = 2.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // point 1.0 sits exactly on interval 3's inclusive lower bound —
    // the clamped upper bucket keeps the start's bucket covered
    assert(got === Set((2L, 3L)))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
    }
    assert(e.getMessage.contains("bucketWidth"))
  }
}
