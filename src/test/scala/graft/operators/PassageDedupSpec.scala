package graft.operators

import graft.SparkSpec

/** Passage stats must equal a hand-computed reference: non-overlapping
  * full windows only, multiplicity counts within- AND cross-document
  * repeats, and zero-passage docs still appear. */
class PassageDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicated-passage stats match a brute-force reference") {
    // w=2 passages: d1 -> ["a b","c d"], d2 -> ["a b"] ("e" tail dropped),
    // d3 -> ["c d","c d"] (within-doc repeat), d4 -> [] (1 token)
    val df = Seq(
      (1L, "a b c d"), (2L, "a b e"), (3L, "c d c d"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = PassageDedup.stats(df, "doc_id", "text", w = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // corpus multiplicity: "a b"×2, "c d"×3, "e"-tail and "x" never emit
    assert(got === Seq(
      (1L, 2L, 2L, 1.0),   // both passages duplicated elsewhere
      (2L, 1L, 1L, 1.0),
      (3L, 2L, 2L, 1.0),   // within-doc repeat counts
      (4L, 0L, 0L, 0.0)))  // sub-w doc survives with zero passages
  }

  test("unique passages are not flagged") {
    val df = Seq((1L, "a b c d"), (2L, "e f g h")).toDF("doc_id", "text")
    val got = PassageDedup.stats(df, "doc_id", "text", w = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0)))
  }

  test("hash-key mode flags the same docs and keeps the two-exchange plan") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val s = PassageDedup.stats(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long, Double)].collect().toSet
    val h = PassageDedup.stats(docs, "doc_id", "text", w = 8, hashKey = true)
    assert(h.as[(Long, Long, Long, Double)].collect().toSet === s)
    // same shape as q90's plan assertion: one exchange on the (now
    // 8-byte) passage key, one on the doc rollup — hashing must not
    // add a stage
    val p = h.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, p)
  }

  test("passages are non-overlapping windows in token order") {
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    val ps = PassageDedup.passages(df, "doc_id", "text", w = 3)
      .orderBy("p").as[(Long, String)].collect().map(_._2).toSeq
    assert(ps === Seq("t0 t1 t2", "t3 t4 t5")) // t6 tail dropped
  }
}
