package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDemux

/**
 * End-to-end streaming demo/drive: synthesize a DMS envelope backlog,
 * serve it through the Kinesis-shaped source, split per table, report.
 * Usage: runMain graft.tools.StreamDemo [nRecords]
 */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("person", "sporting_event_ticket", "seat", "sport_team")
    val backlog = java.nio.file.Files.createTempFile("backlog", ".jsonl")
    val lines = (0 until n).map { i =>
      val tbl = tables(i % tables.length)
      val ctl = i % 97 == 0
      val data = if (ctl) "null" else s"""{"ID": $i, "val": "v$i"}"""
      val rt = if (ctl) "control" else "data"
      s"""{"data": $data, "metadata": {"timestamp": "2019-11-13T09:${59 - (i % 30)}:08.${i % 1000000}Z", "record-type": "$rt", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "$tbl"}}"""
    }
    java.nio.file.Files.write(backlog, lines.mkString("\n").getBytes("UTF-8"))

    val raw = spark.readStream.format("graft-kinesis-sim")
      .option("path", backlog.toString)
      .option("shards", "2")
      .option("maxRecordsPerTrigger", "250")
      .option("keyRegex", "\"ID\": ([0-9]+)")
      .load()
      .select(col("data").as("value"))

    val out = java.nio.file.Files.createTempDirectory("streamdemo").toString
    val ckpt = java.nio.file.Files.createTempDirectory("streamdemo_ckpt").toString
    val q = StreamingDemux.splitStream(StreamingDemux.parseEnvelopes(raw),
      out, ckpt, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    println(s"micro-batches: ${q.recentProgress.length}")
    val split = spark.read.parquet(out)
    split.groupBy("schema_name", "table_name").count()
      .orderBy("table_name").show(truncate = false)
    val controls = lines.count(_.contains("\"control\""))
    println(s"input=$n controls=$controls split=${split.count()} " +
      s"conserved=${split.count() + controls == n}")
    spark.stop()
  }
}
