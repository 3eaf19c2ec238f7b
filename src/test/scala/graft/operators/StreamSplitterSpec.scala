package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.model.DmsEnvelope

/** F1/P1/splitAll semantics on reference-faithful envelope fixtures
  * (FIXTURES.md §A; reference README.md:200-221, 255-310). */
class StreamSplitterSpec extends SparkSpec {
  import spark.implicits._

  private val personData = StructType(Seq(
    StructField("ID", IntegerType), StructField("full_name", StringType),
    StructField("last_name", StringType), StructField("first_name", StringType)))
  private val schema = DmsEnvelope.envelopeSchema(personData)

  private def meta(table: String, rt: String = "data", op: String = "load",
      ts: String = "2019-11-13T09:59:08.059607Z") =
    Row(ts, rt, op, "primary-key", "dms_sample", table)

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(Row(3410177, "Anderson Aaron", "Aaron", "Anderson"), meta("person")),
      Row(Row(3410178, "Berta Bee", "Bee", "Berta"), meta("person", op = "insert")),
      Row(null, meta("person", rt = "control", op = "create-table")), // DDL ⇒ data null
      Row(Row(1, "x", "y", "z"), meta("seat"))
    )), schema)

  test("demux keeps only the table's data records (F1)") {
    val out = StreamSplitter.demux(fixture, "dms_sample", "person")
    assert(out.count() === 2)
    assert(out.filter(col("data").isNull).count() === 0)
  }

  test("flatten produces the golden person schema (P1, image/image5.png)") {
    val out = StreamSplitter.flatten(
      StreamSplitter.demux(fixture, "dms_sample", "person"))
    assert(out.columns.toSeq === Seq("ID", "full_name", "last_name", "first_name", "timestamp"))
    assert(out.schema("timestamp").dataType === StringType)
    val r = out.orderBy("ID").head()
    assert(r.getAs[Int]("ID") === 3410177)
    assert(r.getAs[String]("timestamp") === "2019-11-13T09:59:08.059607Z")
  }

  test("splitAll conserves rows: sum of per-table splits + dropped controls = input") {
    val dir = java.nio.file.Files.createTempDirectory("splitall").toString
    StreamSplitter.splitAll(fixture, dir)
    val out = spark.read.parquet(dir)
    val controls = fixture.filter(col("data").isNull).count()
    assert(out.count() + controls === fixture.count())
    // hive layout: partition pruning per table
    val person = out.filter(col("table_name") === "person")
    assert(person.count() === 2)
    assert(new java.io.File(s"$dir/schema_name=dms_sample/table_name=person").exists())
  }

  test("splitOne writes hive-partitioned parquet (R1+S6)") {
    val dir = java.nio.file.Files.createTempDirectory("splitone").toString
    StreamSplitter.splitOne(fixture, "dms_sample", "person", dir,
      partitionKeys = Seq("first_name"))
    assert(new java.io.File(s"$dir/dms_sample/person/first_name=Anderson").exists())
    val back = spark.read.parquet(s"$dir/dms_sample/person")
    assert(back.count() === 2)
  }
}
