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
}
