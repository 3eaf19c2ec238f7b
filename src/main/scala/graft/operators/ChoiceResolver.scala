package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Choice-type (union) resolution — SURVEY §2.8.
 *
 * The reference's crawler infers a union schema over 16 tables' payloads and
 * surfaces conflicting field types as a `choice` union (e.g. `ticket_price:
 * choice{double,int}` from decimal 46.570000 vs integral values —
 * reference image/image2.png, README.md:210). Spark has no union type, so we
 * implement the `cast`-to-widest policy: merge schemas field-by-field,
 * widening conflicting primitive types, then project with `try_cast` so
 * unparseable cells become NULL instead of failing the job.
 */
object ChoiceResolver {

  /** Widest common type of two conflicting primitives (cast policy). */
  def widest(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (s: StructType, t: StructType) => mergeStructs(s, t)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      ArrayType(widest(x, y), n1 || n2)
    case (x: NumericType, y: NumericType) =>
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      (order.indexOf(x), order.indexOf(y)) match {
        case (ix, iy) if ix >= 0 && iy >= 0 => order(math.max(ix, iy))
        case _ => DoubleType // decimals etc. → double, matching the crawler
      }
    case (NullType, y) => y
    case (x, NullType) => x
    // irreconcilable (string vs numeric, bool vs int, …) → string keeps
    // every value representable; typed projection re-casts downstream
    case _ => StringType
  }

  /** Union-by-name of two structs, recursing into nested fields. */
  def mergeStructs(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          StructField(fa.name, widest(fa.dataType, fb.dataType),
            fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true) // absent in b ⇒ nullable
      }
    }
    val aNames = a.fieldNames.toSet
    val extras = b.fields.filterNot(f => aNames(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extras)
  }

  /** Union schema of N per-table payload schemas (the crawler's view). */
  def mergeSchemas(schemas: Seq[StructType]): StructType =
    schemas.reduceLeft(mergeStructs)

  /**
   * Project `df` onto `target`: try_cast every present column to the
   * resolved type, NULL-fill the absent ones. Pure projection — stays
   * inside whole-stage codegen.
   */
  def resolveTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.schema.fieldNames.toSet
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      if (present(f.name)) {
        val c = col(s"`${f.name}`")
        if (df.schema(f.name).dataType == f.dataType) c
        else c.try_cast(f.dataType).as(f.name)
      } else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
