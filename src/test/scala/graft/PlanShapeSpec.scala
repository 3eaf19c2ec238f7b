package graft

/** Plan-shape regression tests: the 100 TB properties PLANS.md/SCALING.md
  * argue from, enforced on the actual physical plans so a refactor can't
  * silently lose a pushdown, a broadcast, or partial aggregation. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString
  }
  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: predicate and projection reach the parquet scan") {
    val p = formatted("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // pruned read schema — nowhere near all 16 lineitem columns
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.count(_ == ',') <= 6, read)
  }

  test("q03: all dimension joins broadcast; fact side never shuffles pre-agg") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly one hash exchange: the aggregation's (plus the final sort's
    // range exchange) — the fact scan feeds broadcasts directly
    val hashExchanges = p.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges === 1, p)
  }

  test("q01: aggregation is partial before the exchange, final after") {
    val p = plan("q01_agg")
    val idxPartial = p.indexOf("partial_sum")
    val idxExchange = p.indexOf("Exchange hashpartitioning")
    val idxFinal = p.indexOf("HashAggregate")
    assert(idxPartial >= 0 && idxExchange >= 0 && idxFinal >= 0, p)
    // plan prints top-down: final agg above the exchange, partial below
    assert(idxFinal < idxExchange && idxExchange < idxPartial, p)
  }

  test("q58: bloom membership filter sits on the fact side before the join") {
    val p = plan("q58_bloom_join")
    val idxFilter = p.indexOf("might_contain")
    val idxJoin = math.max(p.indexOf("BroadcastHashJoin"), p.indexOf("SortMergeJoin"))
    assert(idxFilter >= 0, p)
    assert(idxJoin >= 0, p)
    // plan prints top-down: the join appears above (before) its child filter
    assert(idxJoin < idxFilter, p)
  }

  test("q51: custom operator replaces Sort+Window entirely") {
    val p = plan("q51_topk_group")
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("q95: the ORC readback prunes to the filtered lang partition") {
    // build the query (side effect: the ORC write runs) and check the
    // scan carries the filter as a PARTITION filter — directory-level
    // pruning, not a full-scan-then-filter. (inputFiles would list the
    // whole relation; PartitionFilters is what the scan actually reads.)
    val df = SparkEntry.queries("q95_orc_roundtrip")(spark, sf0001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("lang") && pf.contains("en"), p)
    // and the scan's data filters don't re-apply it
    assert(!p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("lang")), p)
  }

  test("q90: passage multiplicity costs exactly two hash exchanges (passage key, doc key)") {
    val p = plan("q90_passage_dedup")
    val hashExchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // one shuffle on the passage string for the window count, one on
    // doc_id for the rollup; the count-then-join-back form would pay
    // the passage shuffle twice
    assert(hashExchanges === 2, p)
  }

  test("q106: semantic-dedup pair generation is cluster-bounded — no all-pairs product") {
    val p = plan("q106_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the self-join keys on cluster_id — the quantizer bucket is the
    // candidate bound, exactly like an LSH band join
    assert(p.contains("cluster_id"), p)
  }

  test("q102: indexed admission scans the batch once and the narrow index once — no history text rescan") {
    val df = SparkEntry.queries("q102_indexed_dedup")(spark, sf0001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // exactly two parquet scans: the batch (documents) + the fp index
    // (count the detail headers "(N) Scan parquet" — the tree section
    // prints each scan a second time)
    val scans = p.linesIterator
      .filter(_.trim.matches("""\(\d+\) Scan parquet\s*""")).toSeq
    assert(scans.size === 2, p)
    // the index side reads ONLY the 8-byte fp column (narrow scan), and
    // the one documents scan is the batch — nothing re-reads history text
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(r => r.contains("fp:bigint") && !r.contains("text")), p)
    assert(reads.count(_.contains("text")) === 1, p)
  }

  test("q97: the deterministic group sample plans as TopKPerGroup, no Window sort") {
    val p = plan("q97_group_sample")
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("WindowExec"), p)
  }

  test("q04: global top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q04_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q67/q68: hints force the large-join shuffle strategies") {
    val smj = plan("q67_sortmerge_join")
    assert(smj.contains("SortMergeJoin"), smj)
    assert(!smj.contains("BroadcastHashJoin"), smj)
    val shj = plan("q68_shuffle_hash_join")
    assert(shj.contains("ShuffledHashJoin"), shj)
    assert(!shj.contains("BroadcastHashJoin"), shj)
  }

  test("q74: prefix sum is the two-pass shape — range exchange + per-pid window, no global window") {
    val p = formatted("q74_pack_sequences")
    assert(p.contains("rangepartitioning"), p)
    // the cumsum window is grouped by the partition id, never a
    // partition-less ORDER BY over everything (the one-task bottleneck)
    assert(p.contains("__pid"), p)
  }

  test("q76: benchmark membership is a broadcast semi-join on the fact side") {
    val p = plan("q76_contamination")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q22: the rarity re-sort runs on hashed shingles — no string reaches the window") {
    // ngramJaccardPairs keys its candidate machinery on xxhash64(s);
    // the per-doc rank window is the widest of those legs, and its
    // input carrying the ~40-byte shingle strings (instead of the 8-byte
    // hash) is exactly the shuffle-volume regression this pins against
    val df = SparkEntry.queries("q22_jaccard")(spark, sf0001)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!w.child.output.exists(
          _.dataType == org.apache.spark.sql.types.StringType),
        s"window input carries a string column: ${w.child.output.mkString(", ")}")
    }
  }
}
