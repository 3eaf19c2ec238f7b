package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mixture materialization must be a pure function of (id, source
  * weights, salt): integer part replicates exactly, fractional part
  * admits ~frac of ids deterministically, absent sources drop. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 900L)
    .map(i => (i, Seq("a", "b", "c")(i.toInt % 3)))
    .toDF("doc_id", "source")

  test("integer weights replicate exactly; absent sources drop") {
    val out = Mixing.materialize(docs, "doc_id", "source",
      Map("a" -> 2.0, "b" -> 1.0)) // c absent
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (src, n, mx) = (r.getString(1), r.getLong(2), r.getLong(3))
      if (src == "a") { assert(n === 2L); assert(mx === 1L) }
      else { assert(src === "b"); assert(n === 1L); assert(mx === 0L) }
    }
    assert(out.filter(col("source") === "c").count() === 0)
  }

  test("fractional weight admits ~frac of ids; expected copies per doc = w") {
    val out = Mixing.materialize(docs, "doc_id", "source",
      Map("a" -> 0.5, "b" -> 2.25, "c" -> 0.25))
    val n = out.groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // 300 docs per source; draws are hash-uniform so ±40% slack is ample
    assert(n("a") > 90 && n("a") < 210, n)                 // ~150
    assert(n("b") > 600 + 30 && n("b") < 600 + 150, n)     // ~675
    assert(n("c") > 30 && n("c") < 150, n)                 // ~75
  }

  test("deterministic under repartitioning; salt re-draws the admission") {
    val w = Map("a" -> 0.5, "b" -> 1.5, "c" -> 1.0)
    val one = Mixing.materialize(docs, "doc_id", "source", w, salt = "s1")
      .as[(Long, String, Long)].collect().toSet
    val two = Mixing.materialize(docs.repartition(17, col("doc_id") % 5),
        "doc_id", "source", w, salt = "s1")
      .as[(Long, String, Long)].collect().toSet
    assert(one === two)
    val other = Mixing.materialize(docs, "doc_id", "source", w, salt = "s2")
      .as[(Long, String, Long)].collect().toSet
    assert(one !== other)
    // integer-part copies never move under a salt change — only the
    // fractional admission re-draws
    val oneIds = one.collect { case (id, src, 0L) if src == "b" => id }
    val otherIds = other.collect { case (id, src, 0L) if src == "b" => id }
    assert(oneIds === otherIds) // copy 0 of w>=1 sources is unconditional
  }

  test("weights-table form equals the map-literal form") {
    val wm = Map("a" -> 0.5, "b" -> 2.25) // c unweighted in both forms
    val wdf = wm.toSeq.toDF("source", "wt")
    val fromMap = Mixing.materialize(docs, "doc_id", "source", wm, salt = "x")
      .as[(Long, String, Long)].collect().toSet
    val fromTable = Mixing.materializeFromTable(docs, "doc_id", "source",
        wdf, salt = "x")
      .as[(Long, String, Long)].collect().toSet
    assert(fromMap === fromTable)
    assert(fromMap.nonEmpty)
  }

  test("out-of-range weights are rejected") {
    intercept[IllegalArgumentException] {
      Mixing.materialize(docs, "doc_id", "source", Map("a" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Mixing.materialize(docs, "doc_id", "source", Map("a" -> 1001.0))
    }
  }

  test("weights-table form rejects duplicate sources and out-of-range weights") {
    intercept[IllegalArgumentException] { // doubled source ≠ upweighting
      Mixing.materializeFromTable(docs, "doc_id", "source",
        Seq(("a", 1.0), ("a", 1.0)).toDF("source", "wt"))
    }
    intercept[IllegalArgumentException] { // negative w would drop rows silently
      Mixing.materializeFromTable(docs, "doc_id", "source",
        Seq(("a", -0.5)).toDF("source", "wt"))
    }
  }

  test("weights-table form rejects NULL weights (min/max skip nulls)") {
    // a NULL wt passes the min/max range check (aggregates skip nulls)
    // and would then silently drop source b's documents — reject loudly
    val w = Seq(("a", Some(1.0)), ("b", Option.empty[Double]))
      .toDF("source", "wt")
    val e = intercept[IllegalArgumentException] {
      Mixing.materializeFromTable(docs, "doc_id", "source", w)
    }
    assert(e.getMessage.contains("NULL"))
  }
}
