package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDemux

/** Dev measurement (not part of the driver contract): sustained
  * throughput of the CORE reference path — envelope stream → demux →
  * per-table partitioned parquet sink — at a realistic table fan-out,
  * with and without a mid-soak reshard, plus a checkpoint-recovery
  * replay. SCALING.md has soak numbers for ANN ingest and the full CDC
  * pipeline (6,077 rec/s) but none for the plain demux lander the
  * reference's Glue job actually is.
  *
  * Usage: runMain graft.tools.DemuxSoak [nRecords] [tables] [perTrigger]
  * Prints one JSON line per scenario: records/s over the full drain,
  * micro-batch count, conservation, and (reshard scenario) the replay
  * check — a second AvailableNow run from the same checkpoint must
  * land nothing new.
  */
object DemuxSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nTables = args.lift(1).map(_.toInt).getOrElse(16)
    val perTrigger = args.lift(2).map(_.toInt).getOrElse(25000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = (0 until nTables).map(i => f"table_$i%02d")
    val backlog = java.nio.file.Files.createTempFile("demuxsoak", ".jsonl")
    val lines = (0 until n).map { i =>
      val tbl = tables(i % tables.length)
      s"""{"data": {"ID": $i, "val": "v$i", "amount": ${i % 1000}.25}, "metadata": {"timestamp": "2019-11-13T09:${10 + i % 49}:08.${i % 1000000}Z", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "$tbl"}}"""
    }
    java.nio.file.Files.write(backlog,
      lines.mkString("\n").getBytes("UTF-8"))

    def scenario(tag: String, reshard: Option[String],
        silent: Boolean = false): Unit = {
      val out = java.nio.file.Files.createTempDirectory(s"dsoak_$tag").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"dsoak_ck_$tag").toString
      def run(): (Long, Int) = {
        val r0 = spark.readStream.format("graft-kinesis-sim")
          .option("path", backlog.toString)
          .option("shards", "4")
          .option("maxRecordsPerTrigger", perTrigger.toString)
          .option("keyRegex", "\"ID\": ([0-9]+)")
        val raw = reshard.fold(r0)(r => r0.option("reshards", r))
          .load()
          .select(col("data").as("value"))
        val t0 = System.nanoTime()
        val q = StreamingDemux.splitStream(
          StreamingDemux.parseEnvelopes(raw), out, ckpt,
          trigger = Trigger.AvailableNow())
        q.awaitTermination(600000)
        ((System.nanoTime() - t0) / 1000000L, q.recentProgress.length)
      }
      val (ms, batches) = run()
      if (silent) return // JVM/codegen warm-up only
      val count = spark.read.parquet(out).count()
      val perTable = spark.read.parquet(out)
        .groupBy("table_name").count().count()
      // replay: a restart from the drained checkpoint must land nothing
      val (replayMs, _) = run()
      val after = spark.read.parquet(out).count()
      println(s"""{"scenario":"$tag","n":$n,"tables":$nTables,""" +
        s""""per_trigger":$perTrigger,"wall_ms":$ms,""" +
        s""""rec_per_sec":${(n * 1000L) / math.max(1L, ms)},""" +
        s""""micro_batches":$batches,"conserved":${count == n},""" +
        s""""tables_seen":$perTable,"replay_ms":$replayMs,""" +
        s""""replay_clean":${after == count}}""")
    }

    scenario("warmup", None, silent = true)
    scenario("flat", None)
    // two epochs mid-backlog: shard 0 splits at 40%, child re-splits
    // at 70% — the demux must neither lose nor duplicate across either
    scenario("reshard",
      Some(s"split@${(n * 0.4).toInt}:0;split@${(n * 0.7).toInt}:4"))
    spark.stop()
  }
}
