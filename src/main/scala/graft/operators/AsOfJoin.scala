package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the most recent right row of the
 * same key with `right.time <= left.time` (backward direction; the
 * standard CDC/event-enrichment primitive Spark's DataFrame API lacks).
 *
 * Implemented the scale path, not the nested-loop one: tag and union the
 * two sides, then one `Window.partitionBy(key).orderBy(time, side)` with
 * `last(col, ignoreNulls)` carries the latest right payload forward onto
 * each left row. Cost = ONE shuffle on the key + a sort within
 * partitions — the same plan shape as a sort-merge join, so it survives
 * 100 TB (no per-row lookups, no broadcast requirement, skew behaves
 * like any keyed sort). Right rows sort before left rows at equal time
 * (side 0 < 1), giving inclusive `<=` semantics like DuckDB's ASOF JOIN.
 */
object AsOfJoin {

  /**
   * @param left      probe side
   * @param right     reference side (its `valueCols` are carried over)
   * @param keyCols   equality key columns (same names on both sides)
   * @param timeCol   ordering column name (same name on both sides; any
   *                  orderable type)
   * @param valueCols right columns to attach (null when no match yet)
   * @param tiebreak  right column resolving equal-(key, time) right rows:
   *                  the row with the GREATEST tiebreak value wins. With
   *                  duplicates and no tiebreak, which payload attaches is
   *                  partition-order nondeterministic — and an external
   *                  oracle (DuckDB ASOF) picks its own arbitrary row, so
   *                  results can't be compared (round-2 advice). Pass a
   *                  column unique within (key, time), e.g. an event id.
   */
  def backward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], tiebreak: Option[String] = None): DataFrame =
    asof(left, right, keyCols, timeCol, valueCols, tiebreak, forwardDir = false)

  /** Forward as-of: the EARLIEST right row with `right.time >=
    * left.time` per key — the "next event at or after" primitive
    * (lead-time enrichment). Same one-shuffle union+window plan, with
    * the scan direction reversed. */
  def forward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], tiebreak: Option[String] = None): DataFrame =
    asof(left, right, keyCols, timeCol, valueCols, tiebreak, forwardDir = true)

  private def asof(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], tiebreak: Option[String],
      forwardDir: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    // valueCols must not collide with the left side's columns: the
    // union-based plan would emit two same-named columns and crash
    // far downstream with an ambiguous-reference error that never
    // names this contract — rename the left column (or drop it) first
    val overlap = valueCols.filter(c =>
      leftCols.contains(c) && !keyCols.contains(c) && c != timeCol)
    require(overlap.isEmpty,
      s"valueCols ${overlap.mkString(", ")} already exist on the left " +
        "side — rename or drop them before the as-of join")
    // tag sides; align schemas: left gets null value-cols, right gets
    // null left-only cols
    val rightOnly = valueCols
    val leftOnly = leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)

    val lTagged = left
      .withColumn("__side", lit(1))
      .select(
        (keyCols :+ timeCol).map(col) ++
          leftOnly.map(col) ++
          rightOnly.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
          col("__side"): _*)
    // tiebreak: collapse equal-(key, time) right rows to the one with
    // the greatest tiebreak BEFORE the union — one partial-aggregable
    // max_by keyed on (key, time), skew-proof, and the window below
    // then never sees a tie. The whole payload travels as one struct so
    // all attached columns come from the same winning row.
    val rDedup = tiebreak.fold(right) { tb =>
      right
        .groupBy((keyCols :+ timeCol).map(col): _*)
        .agg(max_by(struct(rightOnly.map(col): _*), col(tb)).as("__p"))
        .select((keyCols :+ timeCol).map(col) ++
          rightOnly.map(c => col(s"__p.$c").as(c)): _*)
    }
    val rTagged = rDedup
      .filter(col(timeCol).isNotNull) // null time can never match (see below)
      .withColumn("__side", lit(0))
      .select(
        (keyCols :+ timeCol).map(col) ++
          leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightOnly.map(col) :+
          col("__side"): _*)

    // forward scans time DESCENDING, so "last right seen" = the nearest
    // right at-or-after the left row; __side asc in both directions
    // keeps equal-time right rows ahead of left rows ⇒ inclusive bound.
    // NULL-time semantics mirror SQL inequalities (review finding):
    // null-time LEFT rows sort before every right row (nulls-first in
    // both directions) so they match nothing, and null-time RIGHT rows
    // are dropped above — a NULL can never satisfy <= or >=.
    val timeOrder =
      if (forwardDir) col(timeCol).desc_nulls_first
      else col(timeCol).asc_nulls_first
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry the whole right payload as ONE struct so every attached
    // column comes from the SAME right row even when some are null
    val unioned = lTagged.unionByName(rTagged)
      .withColumn("__payload",
        when(col("__side") === 0, struct(rightOnly.map(col): _*)))

    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1) // keep left rows only
      .select(
        (keyCols :+ timeCol).map(col) ++
          leftOnly.map(col) ++
          rightOnly.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
