package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join: latest right row at or before left time") {
    val left = Seq(
      (1L, 10L, "c1"), (1L, 25L, "c2"), (1L, 5L, "c0"),
      (2L, 50L, "c3")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 60L, 300.0))
      .toDF("k", "t", "price")

    val out = AsOfJoin.backward(left, right, Seq("k"), "t", Seq("price"))
      .orderBy("k", "t")
      .as[(Long, Long, String, Option[Double])].collect().toSeq

    assert(out === Seq(
      (1L, 5L, "c0", None),         // before any right row
      (1L, 10L, "c1", Some(100.0)), // inclusive: t == right.t matches
      (1L, 25L, "c2", Some(200.0)), // latest prior (20), not first (10)
      (2L, 50L, "c3", None)))       // right row for k=2 is later (60)
  }

  test("forward as-of join: earliest right row at or after left time") {
    val left = Seq(
      (1L, 10L, "c1"), (1L, 25L, "c2"), (1L, 5L, "c0"),
      (2L, 70L, "c3")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 60L, 300.0))
      .toDF("k", "t", "price")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", Seq("price"))
      .orderBy("k", "t")
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, 5L, "c0", Some(100.0)),  // earliest following (10)
      (1L, 10L, "c1", Some(100.0)), // inclusive: t == right.t matches
      (1L, 25L, "c2", None),        // nothing after 25 for k=1
      (2L, 70L, "c3", None)))       // right row for k=2 is earlier (60)
  }

  test("NULL times follow SQL inequality semantics: no match either side, both directions") {
    val left = Seq(
      (1L, Option(10L), "a"), (1L, Option.empty[Long], "b")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Option(5L), 1.0), (1L, Option.empty[Long], 99.0)).toDF("k", "t", "price")
    val back = AsOfJoin.backward(left, right, Seq("k"), "t", Seq("price"))
      .orderBy(col("t").asc_nulls_last)
      .as[(Long, Option[Long], String, Option[Double])].collect().toSeq
    assert(back === Seq(
      (1L, Some(10L), "a", Some(1.0)),
      (1L, None, "b", None)))       // NULL <= anything is never true
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "t", Seq("price"))
      .orderBy(col("t").asc_nulls_last)
      .as[(Long, Option[Long], String, Option[Double])].collect().toSeq
    assert(fwd === Seq(
      (1L, Some(10L), "a", None),   // no right row at/after 10
      (1L, None, "b", None)))       // NULL >= anything is never true
  }

  test("tiebreak resolves equal-(key, time) right rows to the greatest value, both directions") {
    val left = Seq((1L, 10L, "a"), (1L, 3L, "b")).toDF("k", "t", "tag")
    // two right rows at the SAME (k, t): without a tiebreak which payload
    // attaches is partition-order luck; with one it's the max event id
    val right = Seq(
      (1L, 5L, 100L, 1.0), (1L, 5L, 200L, 2.0), (1L, 5L, 150L, 1.5))
      .toDF("k", "t", "eid", "price")
    val back = AsOfJoin.backward(left, right, Seq("k"), "t",
        Seq("eid", "price"), tiebreak = Some("eid"))
      .orderBy("t")
      .as[(Long, Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(back === Seq(
      (1L, 3L, "b", None, None),
      (1L, 10L, "a", Some(200L), Some(2.0))))
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "t",
        Seq("eid", "price"), tiebreak = Some("eid"))
      .orderBy("t")
      .as[(Long, Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(fwd === Seq(
      (1L, 3L, "b", Some(200L), Some(2.0)),
      (1L, 10L, "a", None, None)))
  }

  test("valueCols colliding with left columns are rejected up front") {
    val left = Seq((1L, 10L, 9.99)).toDF("k", "t", "price")
    val right = Seq((1L, 5L, 42.0)).toDF("k", "t", "price")
    // silently, the union plan would emit two 'price' columns and fail
    // far downstream with an ambiguous reference
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "t", Seq("price"))
    }
    assert(e.getMessage.contains("price"))
  }

  test("left columns and row count are preserved") {
    val left = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "t", "tag")
    val right = Seq((9L, 1L, 1.0)).toDF("k", "t", "price")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", Seq("price"))
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("k", "t", "tag", "price"))
  }
}
