package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of two
 * dimensions so that sorting by the combined key clusters rows that
 * are close in BOTH dimensions. Files written in z order carry narrow
 * min/max ranges on each dimension, so a predicate on either column
 * prunes most files at scan time — the standard multi-column
 * data-skipping layout for very large tables (a single-column sort
 * gives perfect skipping on one dimension and none on the other).
 *
 * Everything here is exact integer bit arithmetic, deliberately
 * expressible in any engine ([[zSql]] emits the identical DuckDB
 * expression for the oracle).
 */
object Layout {

  /**
   * Morton z-value of two non-negative integer columns: bit i of `a`
   * goes to bit 2i+1, bit i of `b` to bit 2i. `bits` per dimension
   * (≤ 31; the result uses 2·bits bits of a long). Values wider than
   * `bits` contribute only their low bits — callers pick `bits` to
   * cover their key range. Codegen-friendly: a flat OR-tree of
   * shift/mask terms, stays inside whole-stage codegen.
   */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1),
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same z-value as a DuckDB SQL expression (operand columns must
    * already be integer-typed); kept textually parallel to [[zValue]]
    * so the oracle replays the layout decision bit for bit. */
  def zSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i + 1})",
          s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")

  /**
   * Production write path: range-partition on the z-value so each
   * output file covers one contiguous z-range (a roughly square tile
   * in (a,b) space), then sort within partitions so row groups are
   * tiled too. `repartitionByRange` samples boundaries — balanced
   * files on any distribution, at the cost of nondeterministic cuts
   * (which is why the ORACLE query uses fixed top-bit tiles instead;
   * see `q88`). One shuffle, no global single-task sort.
   */
  def zOrdered(df: DataFrame, a: String, b: String, bits: Int,
      numFiles: Int): DataFrame = {
    val z = zValue(col(a), col(b), bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /**
   * Per-tile layout statistics with DETERMINISTIC tile ids: the top
   * `tileBits` bits of the z-value (= recursive quadrants of (a,b)
   * space). Emits each tile's row count and per-dimension min/max —
   * the exact metadata a file-skipping scan planner consumes. Fixed
   * value cuts (not sampled), so the result is engine-independent.
   */
  def tileStats(df: DataFrame, a: String, b: String, bits: Int,
      tileBits: Int): DataFrame = {
    require(tileBits >= 1 && tileBits <= 2 * bits, "tileBits out of range")
    val z = zValue(col(a), col(b), bits)
    df.groupBy(shiftright(z, 2 * bits - tileBits).as("tile_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(a)).as(s"min_a"), max(col(a)).as(s"max_a"),
        min(col(b)).as(s"min_b"), max(col(b)).as(s"max_b"))
  }
}
