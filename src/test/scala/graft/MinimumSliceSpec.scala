package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.DmsEnvelope
import graft.operators.StreamSplitter

/** SURVEY §7.1 acceptance — the reference demo replayed end-to-end:
  * envelopes → demux → flatten → compact → partitioned saveAsTable
  * (S6+S7 in one step) → catalog SQL `LIMIT 10` probe (Q1).
  * Golden schema = reference image/image5.png. */
class MinimumSliceSpec extends SparkSpec {

  private val personData = StructType(Seq(
    StructField("ID", IntegerType), StructField("full_name", StringType),
    StructField("last_name", StringType), StructField("first_name", StringType)))

  private def env = spark.createDataFrame(
    spark.sparkContext.parallelize((1 to 40).map { i =>
      Row(
        if (i % 10 == 0) null else Row(i, s"First$i Last$i", s"Last$i", s"First${i % 4}"),
        Row(f"2019-11-13T09:59:$i%02d.059607Z",
          if (i % 10 == 0) "control" else "data",
          if (i <= 20) "load" else "insert", "primary-key", "dms_sample",
          if (i % 7 == 0) "seat" else "person"))
    }), DmsEnvelope.envelopeSchema(personData))

  test("reference demo replay: split → saveAsTable → SQL LIMIT 10") {
    val person = StreamSplitter.flatten(
      StreamSplitter.demux(env, "dms_sample", "person"))
    person.coalesce(1) // R1 compaction
      .write.mode("overwrite").partitionBy("first_name")
      .saveAsTable("target_person") // S6+S7 in one step
    val back = spark.table("target_person")
    // golden column set + types (image/image5.png; Spark lists partition
    // columns last on read where the reference's crawler listed them first)
    assert(back.columns.toSet === Set("first_name", "ID", "full_name", "last_name", "timestamp"))
    assert(back.schema("timestamp").dataType === StringType) // string fidelity
    assert(back.schema("ID").dataType === IntegerType)
    assert(back.schema.forall(_.nullable)) // crawler-style widening
    // Q1: the Athena probe
    val probe = spark.sql("SELECT * FROM target_person LIMIT 10")
    assert(probe.count() === 10)
    // partition dirs exist (hive layout)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED target_person")
      .filter(col("col_name") === "Location").select("data_type").head().getString(0)
    assert(new java.io.File(loc.stripPrefix("file:"), "first_name=First1").exists())
    // conservation: 40 records − 4 controls − 5 seat rows (i%7==0 and not control)
    val expected = (1 to 40).count(i => i % 10 != 0 && i % 7 != 0)
    assert(back.count() === expected)
    spark.sql("DROP TABLE target_person")
  }
}
