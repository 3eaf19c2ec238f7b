package graft.operators

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Choice-type (union) resolution — SURVEY §2.8: `ticket_price:
  * choice{double,int}` resolves to double; irreconcilable → string. */
class ChoiceResolverSpec extends SparkSpec {
  import spark.implicits._

  test("widest: numeric widening, crawler-style") {
    assert(ChoiceResolver.widest(IntegerType, DoubleType) === DoubleType)
    assert(ChoiceResolver.widest(IntegerType, LongType) === LongType)
    assert(ChoiceResolver.widest(DecimalType(10, 2), IntegerType) === DoubleType)
    assert(ChoiceResolver.widest(StringType, IntegerType) === StringType)
    assert(ChoiceResolver.widest(NullType, IntegerType) === IntegerType)
  }

  test("mergeStructs unions by name and widens conflicts") {
    val a = StructType(Seq(StructField("id", IntegerType, nullable = false),
      StructField("ticket_price", IntegerType)))
    val b = StructType(Seq(StructField("id", IntegerType),
      StructField("ticket_price", DoubleType), StructField("seat", StringType)))
    val m = ChoiceResolver.mergeStructs(a, b)
    assert(m("ticket_price").dataType === DoubleType)
    assert(m("seat").dataType === StringType)
    assert(m.fieldNames.toSeq === Seq("id", "ticket_price", "seat"))
  }

  test("resolveTo try_casts and null-fills (A4 fixture: 46.57 + 20 → double)") {
    val df = Seq(("1", "46.570000"), ("2", "20")).toDF("id", "ticket_price")
    val target = StructType(Seq(StructField("id", LongType),
      StructField("ticket_price", DoubleType), StructField("extra", StringType)))
    val out = ChoiceResolver.resolveTo(df, target)
    assert(out.schema === target.copy(fields = target.fields.map(_.copy(nullable = true))))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDouble(1) === 46.57)
    assert(rows(1).getDouble(1) === 20.0)
    assert(rows.forall(_.isNullAt(2)))
  }

  test("unparseable cells become NULL, not errors") {
    val df = Seq("abc", "42").toDF("v")
    val out = ChoiceResolver.resolveTo(df,
      StructType(Seq(StructField("v", IntegerType))))
    assert(out.collect().map(r => Option(r.get(0))).toSet === Set(None, Some(42)))
  }

  // the remaining Glue ResolveChoice policies (image/image2.png's
  // ticket_price: choice{double,int}) over two concrete-typed frames
  private def choiceFrames = {
    val a = Seq((1, 46.57, "row1")).toDF("id", "ticket_price", "tag")
    val b = Seq((2L, 20, "row2")).toDF("id", "ticket_price", "tag")
    Seq(a, b)
  }

  test("resolveUnion make_cols: one column per concrete type") {
    val out = ChoiceResolver.resolveUnion(choiceFrames, ChoiceResolver.ChoicePolicy.MakeCols)
    assert(out.columns.toSeq ===
      Seq("id_int", "id_bigint", "ticket_price_double", "ticket_price_int", "tag"))
    val rows = out.orderBy("tag").collect()
    assert(rows(0).getInt(0) === 1 && rows(0).isNullAt(1)
      && rows(0).getDouble(2) === 46.57 && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(0) && rows(1).getLong(1) === 2L
      && rows(1).isNullAt(2) && rows(1).getInt(3) === 20)
  }

  test("nullability-only type differences are ONE choice, not duplicate columns") {
    import org.apache.spark.sql.types._
    // same array<int> element type, differing only in containsNull —
    // unnormalized both simpleString to "array<int>" and make_cols
    // would emit two columns named f_array<int>, crashing the union
    val s1 = StructType(Seq(StructField("f",
      ArrayType(IntegerType, containsNull = true)), StructField("tag", StringType)))
    val s2 = StructType(Seq(StructField("f",
      ArrayType(IntegerType, containsNull = false)), StructField("tag", StringType)))
    val f1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(Seq(1, 2), "a"))), s1)
    val f2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(Seq(3), "b"))), s2)
    val out = ChoiceResolver.resolveUnion(Seq(f1, f2),
      ChoiceResolver.ChoicePolicy.MakeCols)
    assert(out.columns.toSeq === Seq("f", "tag")) // one column, no choice
    assert(out.count() === 2)
  }

  test("resolveUnion make_struct: union value as a typed struct") {
    val out = ChoiceResolver.resolveUnion(choiceFrames, ChoiceResolver.ChoicePolicy.MakeStruct)
    assert(out.schema("ticket_price").dataType.isInstanceOf[StructType])
    val rows = out.orderBy("tag").collect()
    val p0 = rows(0).getStruct(rows(0).fieldIndex("ticket_price"))
    assert(p0.getDouble(p0.fieldIndex("double")) === 46.57 && p0.isNullAt(p0.fieldIndex("int")))
    val p1 = rows(1).getStruct(rows(1).fieldIndex("ticket_price"))
    assert(p1.isNullAt(p1.fieldIndex("double")) && p1.getInt(p1.fieldIndex("int")) === 20)
  }

  test("resolveUnion project: keeps only the requested concrete type, no casting") {
    val out = ChoiceResolver.resolveUnion(choiceFrames,
      ChoiceResolver.ChoicePolicy.Project(DoubleType))
    assert(out.schema("ticket_price").dataType === DoubleType)
    val rows = out.orderBy("tag").collect()
    assert(rows(0).getDouble(rows(0).fieldIndex("ticket_price")) === 46.57)
    assert(rows(1).isNullAt(rows(1).fieldIndex("ticket_price"))) // int row dropped, not cast
  }
}
