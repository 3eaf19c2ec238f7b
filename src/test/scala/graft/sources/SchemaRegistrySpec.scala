package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.model.DmsEnvelope

/** Crawler analog: per-table schema inference over raw (string-`data`)
  * envelopes + late-bound from_json demux. */
class SchemaRegistrySpec extends SparkSpec {

  private def meta(table: String, rt: String = "data") =
    Row("2019-11-13T09:59:08.059607Z", rt, "load", "primary-key", "dms_sample", table)

  // raw envelopes: data is a JSON STRING (streaming-safe form)
  private def raw = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("""{"ID": 1, "full_name": "A B"}""", meta("person")),
      Row("""{"ID": 2, "full_name": "C D", "email": "cd@x.com"}""", meta("person")),
      Row("""{"id": 7, "ticket_price": 46.57}""", meta("sporting_event_ticket")),
      Row(null, meta("person", rt = "control"))
    )), DmsEnvelope.rawEnvelopeSchema)

  test("inferAll crawls every table present and registers union schemas") {
    val reg = new SchemaRegistry
    val keys = reg.inferAll(spark, raw)
    assert(keys === Seq("dms_sample" -> "person", "dms_sample" -> "sporting_event_ticket"))
    val person = reg.get("dms_sample", "person").get
    // union across records: email appears though only one record has it
    assert(person.fieldNames.toSet === Set("ID", "full_name", "email"))
    assert(person("ID").dataType === LongType) // JSON inference widens ints
  }

  test("bindTable decodes and flattens with the registered schema") {
    val reg = new SchemaRegistry
    reg.infer(spark, raw, "dms_sample", "person")
    val person = reg.bindTable(raw, "dms_sample", "person")
    assert(person.columns.toSeq.sorted === Seq("ID", "email", "full_name", "timestamp"))
    assert(person.count() === 2) // control dropped
    assert(person.filter(col("email").isNull).count() === 1)
  }

  test("bindTable without a registered schema fails loudly") {
    val reg = new SchemaRegistry
    intercept[IllegalArgumentException] {
      reg.bindTable(raw, "dms_sample", "person")
    }
  }

  test("bindTable works identically on a streaming DataFrame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // registry populated from the batch crawl (the reference's
    // crawler-then-job order); the stream late-binds with it
    val reg = new SchemaRegistry
    reg.infer(spark, raw, "dms_sample", "person")
    val mem = MemoryStream[String]
    mem.addData(
      """{"data": "{\"ID\": 5, \"full_name\": \"E F\"}", "metadata": {"timestamp": "2019-11-13T09:59:11.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "person"}}""",
      """{"data": "{\"id\": 9}", "metadata": {"timestamp": "2019-11-13T09:59:12.000000Z", "record-type": "data", "operation": "insert", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "sporting_event_ticket"}}""")
    val parsed = mem.toDF().select(
      from_json(col("value"), DmsEnvelope.rawEnvelopeSchema).as("env"))
      .select(col("env.data").as("data"), col("env.metadata").as("metadata"))
    val bound = reg.bindTable(parsed, "dms_sample", "person")
    assert(bound.isStreaming)
    val q = bound.writeStream.format("memory").queryName("bound_person")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("bound_person").collect()
    assert(rows.length === 1) // ticket record demuxed away
    assert(rows.head.getAs[Long]("ID") === 5L)
    assert(rows.head.getAs[String]("full_name") === "E F")
  }
}
