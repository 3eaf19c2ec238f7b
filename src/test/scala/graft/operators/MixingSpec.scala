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

  test("token-budget plan: Σ wt·tokens = budget; materialized mix lands near target") {
    // inventory: a-heavy corpus; target: b-heavy mix
    val totals = Seq(("a", 60000L), ("b", 10000L), ("c", 30000L))
      .toDF("src", "tokens")
    val plan = Mixing.planTokenBudget(totals, "src", "tokens",
      Map("a" -> 0.2, "b" -> 0.5, "c" -> 0.3), budgetTokens = 50000L)
    val rows = plan.orderBy("src")
      .as[(String, Long, Double, Double)].collect()
    // exact arithmetic: wt = budget·frac / tokens
    assert(rows.map(_._4) === Array(
      50000.0 * 0.2 / 60000, 50000.0 * 0.5 / 10000, 50000.0 * 0.3 / 30000))
    // over-targeted b upsamples, over-inventoried a downsamples
    assert(rows(1)._4 > 1.0 && rows(0)._4 < 1.0)
    // Σ wt·tokens = budget exactly
    assert(rows.map(r => r._4 * r._2).sum === 50000.0)

    // end-to-end: per-doc tokens uniform per source, so the
    // materialized token share must land near the target fractions
    val perDoc = Map("a" -> 100L, "b" -> 50L, "c" -> 60L)
    val corpus = perDoc.toSeq.flatMap { case (s2, tok) =>
      val nDocs = (Map("a" -> 60000L, "b" -> 10000L, "c" -> 30000L)(s2)
        / tok).toInt
      (1 to nDocs).map(i => (s"$s2-$i", s2, tok))
    }.toDF("doc_id", "src", "doc_tokens")
    val wts = plan.select("src", "wt").as[(String, Double)]
      .collect().toMap
    val mixed = Mixing.materialize(corpus, "doc_id", "src", wts)
      .join(corpus, Seq("doc_id", "src"))
    val got = mixed.groupBy("src")
      .agg(sum("doc_tokens").as("t")).as[(String, Long)].collect().toMap
    val total = got.values.sum.toDouble
    assert(math.abs(got("b") / total - 0.5) < 0.05, got)
    assert(math.abs(got("a") / total - 0.2) < 0.05, got)
    assert(math.abs(total - 50000.0) < 2500.0, total)
  }

  test("token-budget plan rejects targets with no inventory (silent under-run)") {
    val totals = Seq(("a", 60000L), ("zero", 0L)).toDF("src", "tokens")
    val e = intercept[IllegalArgumentException] {
      Mixing.planTokenBudget(totals, "src", "tokens",
        Map("a" -> 0.4, "code" -> 0.3, "zero" -> 0.3), 10000L)
    }
    assert(e.getMessage.contains("code") && e.getMessage.contains("zero"))
    // a zero-fraction absent source is fine — it asks for nothing
    val ok = Mixing.planTokenBudget(totals, "src", "tokens",
      Map("a" -> 1.0, "code" -> 0.0), 10000L)
    assert(ok.count() === 1)
  }

  test("token-budget plan rejects duplicate inventory rows (doubled share)") {
    // a union of two inventory snapshots: each copy would get the FULL
    // wt = budget·frac/tokens, doubling the source's planned share
    val dup = Seq(("a", 60000L), ("a", 60000L), ("b", 1000L))
      .toDF("src", "tokens")
    val e = intercept[IllegalArgumentException] {
      Mixing.planTokenBudget(dup, "src", "tokens",
        Map("a" -> 0.5, "b" -> 0.5), 10000L)
    }
    assert(e.getMessage.contains("duplicate") && e.getMessage.contains("a"))
  }
}
