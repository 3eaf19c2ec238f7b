package graft.operators

import graft.SparkSpec

/** MERGE arbitration: update wins over snapshot, delete removes, insert
  * appends, delete-of-absent is a no-op, untouched rows pass through. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  test("update, delete, insert, and delete-of-absent in one pass") {
    val changes = Seq(
      (2L, "U", "b2", 22.0),  // matched update
      (3L, "D", "c", 0.0),    // matched delete
      (4L, "I", "d", 40.0),   // unmatched insert
      (9L, "D", "z", 0.0))    // delete of absent key: no-op
      .toDF("k", "op", "name", "bal")
    val got = Merge.mergeBatch(target, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 10.0),   // untouched passthrough
      (2L, "b2", 22.0),
      (4L, "d", 40.0)))
  }

  test("unmatched U behaves as upsert; empty change set is identity") {
    val changes = Seq((5L, "U", "e", 50.0)).toDF("k", "op", "name", "bal")
    val got = Merge.mergeBatch(target, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 5L))
    val empty = Seq.empty[(Long, String, String, Double)]
      .toDF("k", "op", "name", "bal")
    val same = Merge.mergeBatch(target, empty, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(same === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("a changes frame without the op column is rejected") {
    val bad = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    intercept[IllegalArgumentException] {
      Merge.mergeBatch(target, bad, "k")
    }
  }

  test("evolve: new column backfills NULL, omitted column survives update") {
    // changes carry `tier` (target has never seen it) and OMIT `name`
    val changes = Seq(
      (2L, "U", 22.0, "gold"), // update: name must survive
      (3L, "D", 0.0, null.asInstanceOf[String]),
      (4L, "I", 40.0, "new")) // insert: name null-fills
      .toDF("k", "op", "bal", "tier")
    val got = Merge.mergeBatchEvolve(target, changes, "k")
      .orderBy("k")
      .as[(Long, Option[String], Double, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, Some("a"), 10.0, None),        // untouched: tier backfills NULL
      (2L, Some("b"), 22.0, Some("gold")), // name kept despite update
      (4L, None, 40.0, Some("new"))))
    // schema = target order first, then the evolved column
    assert(Merge.mergeBatchEvolve(target, changes, "k").columns.toSeq ===
      Seq("k", "name", "bal", "tier"))
  }

  test("evolve with an identical-schema change set degenerates to mergeBatch") {
    val changes = Seq((2L, "U", "b2", 22.0), (4L, "I", "d", 40.0))
      .toDF("k", "op", "name", "bal")
    val evolved = Merge.mergeBatchEvolve(target, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    val plain = Merge.mergeBatch(target, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(evolved === plain)
  }

  test("the op domain is closed: lowercase/unknown/null ops raise, never act") {
    // lowercase 'd' would otherwise be applied as an UPSERT — the
    // delete silently never lands and the dead row lives forever
    def run(op: Option[String]): Unit =
      Merge.mergeBatch(target,
        Seq((2L, op, "x", 0.0)).toDF("k", "op", "name", "bal"),
        "k").collect()
    val e1 = intercept[Exception] { run(Some("d")) }
    assert(e1.getMessage.contains("invalid 'op'"), e1.getMessage)
    val e2 = intercept[Exception] { run(Some("DELETE")) }
    assert(e2.getMessage.contains("invalid 'op'"), e2.getMessage)
    // a NULL op is indistinguishable from "no change arrived" inside
    // the full-outer join — it must raise, not insert an all-NULL row
    val e3 = intercept[Exception] { run(None) }
    assert(e3.getMessage.contains("NULL"), e3.getMessage)
    // evolve shares the validation
    val e4 = intercept[Exception] {
      Merge.mergeBatchEvolve(target,
        Seq((2L, "u", "x", 0.0, "t")).toDF("k", "op", "name", "bal", "tier"),
        "k").collect()
    }
    assert(e4.getMessage.contains("invalid 'op'"), e4.getMessage)
  }
}
