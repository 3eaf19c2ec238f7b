package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Compaction
import graft.streaming.StreamingDemux

/** Ops drive: paced streaming split (many small files per micro-batch)
  * followed by the periodic compaction job. */
object CompactDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val backlog = java.nio.file.Files.createTempFile("bk", ".jsonl")
    val lines = (0 until 800).map { i =>
      s"""{"data": {"ID": $i}, "metadata": {"timestamp": "2019-11-13T09:59:08.000000Z", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "person"}}"""
    }
    java.nio.file.Files.write(backlog, lines.mkString("\n").getBytes("UTF-8"))
    val raw = spark.readStream.format("graft-kinesis-sim")
      .option("path", backlog.toString).option("maxRecordsPerTrigger", "50")
      .load().select(col("data").as("value"))
    val out = java.nio.file.Files.createTempDirectory("cdrive").toString
    val ck = java.nio.file.Files.createTempDirectory("cdrive_ck").toString
    val q = StreamingDemux.splitStream(StreamingDemux.parseEnvelopes(raw),
      out, ck, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val (before, after) = Compaction.compactParquet(spark, out)
    println(s"RESULT micro_batches=${q.recentProgress.length} " +
      s"files_before=$before files_after=$after " +
      s"rows=${spark.read.parquet(out).count()}")
    spark.stop()
  }
}
