package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The two-pass distributed prefix sum must equal the single-window
  * reference exactly — packing is a pure function of the total id
  * order, so range-boundary placement must not show through. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packContiguous equals the global-window reference (shards > 1, shuffled input)") {
    val rnd = new scala.util.Random(17)
    // non-contiguous ids, shuffled arrival order, varied token counts
    val rows = rnd.shuffle((0 until 300).map(i => (i.toLong * 7 + 3, 1L + rnd.nextInt(200))))
    val df = rows.toDF("id", "n")
    val got = Packing.packContiguous(df, "id", "n", budget = 512L, shards = 8)
      .select("id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("start", sum(col("n")).over(w) - col("n"))
      .select(col("id"), col("n").as("n_tokens"),
        expr("start div 512L").as("seq_id"), (col("start") % 512).as("seq_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("per-shard totals are last-by-id, not max: negative counts still sum correctly") {
    // a negative token count makes max(__cum) != total; max_by(__cum, id)
    // must keep every downstream offset exact (round-2 advice)
    val rows = Seq((1L, 10L), (2L, -4L), (3L, 7L), (4L, -1L), (5L, 20L), (6L, 3L))
    val df = rows.toDF("id", "n")
    val got = Packing.packContiguous(df, "id", "n", budget = 8L, shards = 3)
      .select("id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("start", sum(col("n")).over(w) - col("n"))
      .select(col("id"), col("n").as("n_tokens"),
        expr("start div 8L").as("seq_id"), (col("start") % 8).as("seq_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("packBinned: bins never exceed budget, every doc packed once, deterministic fill") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map(i => (i.toLong, 1L + rnd.nextInt(40)))
    val df = rows.toDF("id", "n")
    val out = Packing.packBinned(df, "id", "n", budget = 64L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted === (0L until 200L)) // exactly once each
    // per (len, bin_seq) sequence: total tokens <= budget, slots dense from 0
    out.groupBy(r => (r._2, r._3)).foreach { case ((len, seq), docs) =>
      assert(docs.map(_._2).sum <= 64L, s"bin ($len,$seq) overflows")
      assert(docs.map(_._4).sorted === (0L until docs.size.toLong),
        s"bin ($len,$seq) slots not dense")
    }
    // deterministic: same input, same assignment
    val again = Packing.packBinned(df, "id", "n", budget = 64L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.toSet === again.toSet)
  }

  test("packBinned: null token counts normalize to 0, never cap at the full budget") {
    // left null, unknown-length docs would all land in one null-length
    // partition with __cap = budget — silently overflowing sequences
    val df = Seq((1L, Some(5L)), (2L, None), (3L, None))
      .toDF("doc_id", "n")
    val got = Packing.packBinned(df, "doc_id", "n", budget = 10L)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(got(2L) === 0L && got(3L) === 0L && got(1L) === 5L)
  }

  test("packBinned: docs longer than the budget get singleton bins") {
    val df = Seq((1L, 100L), (2L, 100L), (3L, 5L)).toDF("id", "n")
    val out = Packing.packBinned(df, "id", "n", budget = 64L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1L, 100L, 0L, 0L), (2L, 100L, 1L, 0L), (3L, 5L, 0L, 0L)))
  }

  test("packing invariants: offsets in [0, budget), tape is gapless") {
    val df = (1 to 50).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "n")
    val out = Packing.packContiguous(df, "id", "n", budget = 16L, shards = 4)
      .orderBy("id").collect()
    assert(out.forall { r =>
      val off = r.getAs[Long]("seq_offset"); off >= 0 && off < 16
    })
    // consecutive docs: start(next) = start(prev) + n(prev) on the tape
    val starts = out.map(r => r.getAs[Long]("seq_id") * 16 + r.getAs[Long]("seq_offset"))
    val ns = out.map(_.getAs[Long]("n_tokens"))
    starts.indices.tail.foreach { i =>
      assert(starts(i) === starts(i - 1) + ns(i - 1), s"gap at $i")
    }
    assert(starts.head === 0L)
  }
}
