package graft.sources.kinesis

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.StreamingDemux

class KinesisSimSpec extends SparkSpec {
  import spark.implicits._

  private def writeBacklog(lines: Seq[String]): String = {
    val f = Files.createTempFile("backlog", ".jsonl")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  private def envLine(table: String, id: Int): String =
    s"""{"data": {"ID": $id}, "metadata": {"timestamp": "2019-11-13T09:59:0$id.000000Z", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "$table"}}"""

  test("sharding is deterministic by key; sequence numbers increase per shard") {
    val path = writeBacklog((0 until 20).map(i => envLine("person", i)))
    val out = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "2")
      .load()
      .writeStream.format("memory").queryName("ksim")
      .trigger(Trigger.AvailableNow()).start()
    out.awaitTermination(60000)
    val rows = spark.table("ksim")
      .select("shardId", "sequenceNumber", "partitionKey")
      .as[(Int, Long, String)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._1).toSet === Set(0, 1))
    // per-shard sequences are exactly 0..n-1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (0L until rs.length).toSeq)
    }
    // same key always routes to the same shard
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._1).toSet.size === 1)
    }
  }

  test("maxRecordsPerTrigger paces micro-batches (GetRecords-limit analog)") {
    val path = writeBacklog((0 until 10).map(i => envLine("person", i)))
    val q = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "2")
      .option("maxRecordsPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("ksim_paced")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("ksim_paced").count() === 10) // drains fully...
    assert(q.recentProgress.length >= 2) // ...across multiple micro-batches
  }

  test("end-to-end: kinesis-sim stream → envelope parse → split by table") {
    val path = writeBacklog(
      Seq(envLine("person", 1), envLine("person", 2), envLine("seat", 3)))
    val raw = spark.readStream.format("graft-kinesis-sim")
      .option("path", path)
      .option("keyRegex", "\"ID\": ([0-9]+)")
      .load()
      .select(col("data").as("value")) // Kinesis payload → raw JSON line
    val out = Files.createTempDirectory("ksplit").toString
    val ckpt = Files.createTempDirectory("kckpt").toString
    val q = StreamingDemux.splitStream(
      StreamingDemux.parseEnvelopes(raw), out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    val split = spark.read.parquet(out)
    assert(split.filter(col("table_name") === "person").count() === 2)
    assert(split.filter(col("table_name") === "seat").count() === 1)
  }

  test("bad options fail fast at stream construction, naming the option") {
    def stream(opts: (String, String)*) = new KinesisSimStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(
          (Seq("path" -> "/dev/null") ++ opts).toMap).asJava))
    // a capture-group-less keyRegex would otherwise die batches later
    // inside the backlog build with an unexplained IndexOutOfBounds
    val e1 = intercept[IllegalArgumentException] {
      stream("keyRegex" -> "ID=[0-9]+")
    }
    assert(e1.getMessage.contains("keyRegex"))
    // a 0 paced limit would pin the offsets and "drain" nothing
    val e2 = intercept[IllegalArgumentException] {
      stream("maxRecordsPerTrigger" -> "0")
    }
    assert(e2.getMessage.contains("maxRecordsPerTrigger"))
  }

  test("a checkpoint from a larger shard count fails loudly instead of dropping shards") {
    // restart with shards=2 against a checkpoint written at shards=4:
    // the (0 until shards) loops would silently drop shards 2-3's
    // positions — and their unread records — from every later offset
    val path = writeBacklog((0 until 4).map(i => envLine("person", i)))
    val stream = new KinesisSimStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(
          Map("path" -> path, "shards" -> "2")).asJava))
    val stale = ShardOffsets(Map(0 -> 1L, 1 -> 0L, 2 -> 2L, 3 -> 0L))
    val e = intercept[IllegalArgumentException] {
      stream.latestOffset(stale,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("shards") && e.getMessage.contains("2,3"))
    val e2 = intercept[IllegalArgumentException] {
      stream.planInputPartitions(stale, stale)
    }
    assert(e2.getMessage.contains("shrank"))
    // same count restored: the stale offset is readable again
    val ok = new KinesisSimStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(
          Map("path" -> path, "shards" -> "4")).asJava))
    ok.latestOffset(stale,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
  }
}
