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

  test("landing JSON → schema inference → split (S4/S5, crawler analog)") {
    // two tables' payloads in one landing file: inference produces the
    // union-of-tables data struct, exactly the crawler's view
    // (reference image/image2.png)
    val lines = Seq(
      """{"data": {"ID": 1, "full_name": "A B"}, "metadata": {"timestamp": "t1", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "person"}}""",
      """{"data": {"id": 7, "ticket_price": 46.57}, "metadata": {"timestamp": "t2", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "sporting_event_ticket"}}""",
      """{"data": null, "metadata": {"timestamp": "t0", "record-type": "control", "operation": "create-table", "partition-key-type": "schema-table", "schema-name": "dms_sample", "table-name": "person"}}""")
    val f = java.nio.file.Files.createTempFile("landing", ".json")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    // the union schema case-collides (`id` ticket vs `ID` person,
    // reference image/image2.png) — landing reads need case-sensitive
    // resolution (SURVEY §7.3 risk #2); this IS the documented policy
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      val env = spark.read.json(f.toString)
      val dataFields = env.schema("data").dataType
        .asInstanceOf[StructType].fieldNames.toSet
      assert(dataFields === Set("ID", "full_name", "id", "ticket_price"))
      val person = StreamSplitter.flatten(
        StreamSplitter.demux(env, "dms_sample", "person"))
      assert(person.count() === 1)
      assert(person.select("full_name").head().getString(0) === "A B")
    } finally spark.conf.set("spark.sql.caseSensitive", "false")
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
