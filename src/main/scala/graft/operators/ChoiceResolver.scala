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

  /**
   * The full Glue `ResolveChoice` policy set (reference image/image2.png
   * shows `ticket_price: choice{double,int}`; Glue offers cast /
   * make_cols / make_struct / project). Our frames carry one concrete
   * type each, so a "choice" manifests ACROSS frames: the policies
   * below resolve each conflicting field at union time.
   */
  sealed trait ChoicePolicy
  object ChoicePolicy {
    /** Widen to the common type ([[widest]]) and `try_cast` — the
      * round-1 policy, lossless for numeric widenings. */
    case object Cast extends ChoicePolicy
    /** `f` → one column per concrete type (`f_bigint`, `f_int`, …);
      * each row fills the column of its source type, others NULL. */
    case object MakeCols extends ChoicePolicy
    /** `f` → struct with one member per concrete type — the closest
      * Spark shape to Glue's union value. */
    case object MakeStruct extends ChoicePolicy
    /** Keep only values already of type `t` (no casting — rows of the
      * other types become NULL), column typed `t`. */
    final case class Project(t: DataType) extends ChoicePolicy
  }

  /**
   * Resolve conflicting per-frame schemas under `policy` and union.
   * Field order = first appearance across frames; a field's "choice"
   * is its ordered set of distinct concrete types. Top-level fields
   * (the crawler's payload view); all policies are pure projections —
   * whole-stage codegen, no shuffle beyond the union.
   */
  def resolveUnion(frames: Seq[DataFrame], policy: ChoicePolicy): DataFrame = {
    import scala.collection.mutable
    // types are collected in NULLABILITY-NORMALIZED form: two frames
    // whose field differs only in containsNull/nullable metadata are
    // the same choice, not two — unnormalized, both would simpleString
    // to the same name and MakeCols/MakeStruct would emit duplicate
    // columns/fields that crash the union
    def norm(t: DataType): DataType = t match {
      case ArrayType(e, _) => ArrayType(norm(e), containsNull = true)
      case MapType(k, v, _) =>
        MapType(norm(k), norm(v), valueContainsNull = true)
      case StructType(fs) => StructType(fs.map(f =>
        f.copy(dataType = norm(f.dataType), nullable = true)))
      case other => other
    }
    val fieldTypes = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[DataType]]
    frames.foreach(_.schema.fields.foreach { f =>
      fieldTypes.getOrElseUpdate(f.name, mutable.LinkedHashSet.empty) +=
        norm(f.dataType)
    })
    def typed(df: DataFrame, name: String, t: DataType): Column =
      df.schema.find(_.name == name) match {
        case Some(f) if norm(f.dataType) == t => col(s"`$name`")
        case _ => lit(null).cast(t)
      }
    policy match {
      case ChoicePolicy.Cast =>
        val target = mergeSchemas(frames.map(_.schema))
        frames.map(resolveTo(_, target)).reduce(_.unionByName(_))
      case ChoicePolicy.MakeCols =>
        frames.map { df =>
          val cols = fieldTypes.toSeq.flatMap { case (name, types) =>
            if (types.size == 1)
              Seq(typed(df, name, types.head).as(name))
            else types.toSeq.map(t =>
              typed(df, name, t).as(s"${name}_${t.simpleString}"))
          }
          df.select(cols: _*)
        }.reduce(_.unionByName(_))
      case ChoicePolicy.MakeStruct =>
        frames.map { df =>
          val cols = fieldTypes.toSeq.map { case (name, types) =>
            if (types.size == 1) typed(df, name, types.head).as(name)
            else struct(types.toSeq.map(t =>
              typed(df, name, t).as(t.simpleString)): _*).as(name)
          }
          df.select(cols: _*)
        }.reduce(_.unionByName(_))
      case ChoicePolicy.Project(t) =>
        frames.map { df =>
          val cols = fieldTypes.toSeq.map { case (name, types) =>
            if (types.size == 1) typed(df, name, types.head).as(name)
            else typed(df, name, t).as(name)
          }
          df.select(cols: _*)
        }.reduce(_.unionByName(_))
    }
  }
}
