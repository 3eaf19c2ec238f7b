package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative data-quality constraints — the data-contract layer of a
 * landing pipeline: the checks a 100 TB ingest runs CONTINUOUSLY, not
 * the ad-hoc queries an analyst runs once. Three consumption shapes
 * from one check list:
 *
 *  - [[report]]: one row per check `(check, violations, n_rows,
 *    pass)`. All ROW-LEVEL checks (not-null, range, set, predicate)
 *    fold into a SINGLE aggregate pass over the data — adding a check
 *    costs one more conditional sum, never another scan. Uniqueness
 *    adds one map-combined groupBy on its key; referential integrity
 *    adds one anti-join per dimension (each unavoidable: those are
 *    not row-local properties).
 *  - [[flagRows]]: every row annotated with the names of the
 *    row-level checks it fails (empty array = clean) — computed
 *    expression-level, no shuffle, streaming-safe.
 *  - [[split]]: the quarantine / dead-letter flow — `(clean, bad)`
 *    where bad rows carry their violation list. The landing sink
 *    writes `clean`; `bad` lands in a quarantine dir for repair and
 *    replay instead of poisoning the table or killing the job.
 *
 * Null policy (pinned by ConstraintsSpec + the q124 oracle): NULL
 * passes range/set/ref checks — nullability is [[NotNull]]'s job, and
 * conflating them would double-count every null row. Row-level checks
 * compose with three-valued logic accordingly.
 */
object Constraints {

  sealed trait Check { def name: String }

  /** `col` must be non-null. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
  }
  /** `col` (when non-null) must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($col)"
  }
  /** `col` (when non-null) must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    val name = s"in_set($col)"
  }
  /** Arbitrary row predicate (true = pass; NULL — an unprovable
    * predicate under three-valued logic — counts as a violation, the
    * strict reading a contract wants). */
  final case class Predicate(name: String, pred: Column) extends Check
  /** `cols` must be unique together (all rows of a duplicated key
    * count as violations). */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` must appear in `dim.dimCol`. */
  final case class Ref(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    val name = s"ref($col->$dimCol)"
  }

  /** Pass-predicate of a row-level check. */
  private def rowPred(c: Check): Option[(String, Column)] = c match {
    case NotNull(cn) => Some(c.name -> col(cn).isNotNull)
    case InRange(cn, lo, hi) =>
      Some(c.name -> (col(cn).isNull || col(cn).between(lo, hi)))
    case InSet(cn, vs) =>
      Some(c.name -> (col(cn).isNull || col(cn).isin(vs: _*)))
    case Predicate(n, p) => Some(n -> p)
    case _ => None
  }

  /** The constraint report: `(check, violations, n_rows, pass)`, one
    * row per check, check-name ordered. */
  def report(spark: SparkSession, df: DataFrame,
      checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "give at least one check")
    val rowLevel = checks.flatMap(rowPred)
    // one aggregate pass for every row-level check + the row count;
    // the outer coalesce covers the EMPTY input (sum over zero rows is
    // NULL) — an empty day must report 0 violations, not NPE
    val aggs = count(lit(1)).as("__n") +: rowLevel.zipWithIndex.map {
      case ((_, pred), i) =>
        coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)),
          lit(0L)).as(s"__c$i")
    }
    val head = df.agg(aggs.head, aggs.tail: _*).collect()(0) // 1 row
    val nRows = head.getLong(0)
    val rowCounts = rowLevel.zipWithIndex.map { case ((n, _), i) =>
      n -> head.getLong(i + 1)
    }
    // non-row-local checks: one bounded job each
    val otherCounts = checks.flatMap {
      case u: Unique =>
        val extra = df.groupBy(u.cols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n")), lit(0L))).collect()(0).getLong(0)
        Some(u.name -> extra)
      case r: Ref =>
        val missing = df.select(col(r.col)).filter(col(r.col).isNotNull)
          .join(r.dim.select(col(r.dimCol).as(r.col)).distinct(),
            Seq(r.col), "left_anti")
          .count()
        Some(r.name -> missing)
      case _ => None
    }
    val rows = (rowCounts ++ otherCounts).map { case (n, v) =>
      Row(n, v, nRows, v == 0L)
    }
    val schema = StructType(Seq(
      StructField("check", StringType, nullable = false),
      StructField("violations", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("pass", BooleanType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("check"))
  }

  /** Each row annotated with the ROW-LEVEL checks it fails
    * (`violated` array, empty = clean). Expression-only: no shuffle,
    * streaming-safe. */
  def flagRows(df: DataFrame, checks: Seq[Check],
      outCol: String = "violated"): DataFrame = {
    val rowLevel = checks.flatMap(rowPred)
    require(rowLevel.nonEmpty, "give at least one row-level check")
    df.withColumn(outCol,
      filter(array(rowLevel.map { case (n, pred) =>
        when(!coalesce(pred, lit(false)), lit(n))
      }: _*), x => x.isNotNull))
  }

  /** Quarantine split: `(clean rows unchanged, bad rows + violation
    * list)`. */
  def split(df: DataFrame, checks: Seq[Check],
      outCol: String = "violated"): (DataFrame, DataFrame) = {
    val flagged = flagRows(df, checks, outCol)
    (flagged.filter(size(col(outCol)) === 0).drop(outCol),
      flagged.filter(size(col(outCol)) > 0))
  }
}
