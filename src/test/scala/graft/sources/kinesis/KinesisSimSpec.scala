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

  test("reshard SPLIT: parent closes, children divide its keys, parent drains before children, per-key order survives") {
    // 40 lines over 10 repeating keys; the epoch at line 20 splits
    // shard 0 into children 2 and 3
    val lines = (0 until 40).map(i => s"k${i % 10}:$i")
    val path = writeBacklog(lines)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, Long, String)]
    val q = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "2")
      .option("keyRegex", "k([0-9]+):")
      .option("reshardAtLine", "20").option("reshardShard", "0")
      .option("maxRecordsPerTrigger", "4")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("shardId", "partitionKey", "sequenceNumber",
            "data")
          .collect()
          .map(r => (id, r.getInt(0), r.getString(1), r.getLong(2),
            r.getString(3)))
        buf.synchronized { buf ++= rows }; ()
      }.start()
    q.awaitTermination(120000)
    val rows = buf.toSeq
    // conservation: every line exactly once
    assert(rows.map(_._5).sorted === lines.sorted)
    // routing: pre-epoch by the base mapping; post-epoch split keys to
    // their hash-parity child, other keys unchanged — re-derived here
    rows.foreach { case (_, shard, key, _, data) =>
      val lineIdx = data.split(":")(1).toInt
      val base = KinesisSim.shardFor(key, 2)
      val want =
        if (lineIdx >= 20 && base == 0) 2 + KinesisSim.childFor(key)
        else base
      assert(shard === want, s"line $lineIdx key $key in shard $shard")
    }
    // the parent closed: it only ever held pre-epoch records
    assert(rows.filter(_._2 == 0).forall(_._5.split(":")(1).toInt < 20))
    // children start their own sequences at 0
    Seq(2, 3).foreach { c =>
      val seqs = rows.filter(_._2 == c).map(_._4).sorted
      assert(seqs === (0L until seqs.length).toSeq, s"child $c seqs: $seqs")
    }
    // KCL ordering: no child batch before the parent fully drained
    val parentBatches = rows.filter(_._2 == 0).map(_._1)
    val childBatches = rows.filter(r => r._2 == 2 || r._2 == 3).map(_._1)
    assert(parentBatches.nonEmpty && childBatches.nonEmpty)
    assert(parentBatches.max < childBatches.min,
      s"children advanced (batch ${childBatches.min}) before the parent " +
        s"drained (batch ${parentBatches.max})")
    // ⇒ per-key record order survives the epoch: sort each key's
    // records by (batch, seq) and the embedded line numbers ascend
    rows.groupBy(_._3).foreach { case (key, rs) =>
      val ordered = rs.sortBy(r => (r._1, r._4))
        .map(_._5.split(":")(1).toInt)
      assert(ordered === ordered.sorted,
        s"key $key delivered out of order: $ordered")
    }
  }

  test("reshard MERGE: both parents close, one child owns both key spaces, conservation + ordering hold") {
    val lines = (0 until 30).map(i => s"k${i % 6}:$i")
    val path = writeBacklog(lines)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, String)]
    val q = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "3")
      .option("keyRegex", "k([0-9]+):")
      .option("reshardAtLine", "15")
      .option("reshardOp", "merge").option("reshardShards", "0,2")
      .option("maxRecordsPerTrigger", "3")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("shardId", "partitionKey", "data").collect()
          .map(r => (id, r.getInt(0), r.getString(1), r.getString(2)))
        buf.synchronized { buf ++= rows }; ()
      }.start()
    q.awaitTermination(120000)
    val rows = buf.toSeq
    assert(rows.map(_._4).sorted === lines.sorted)
    rows.foreach { case (_, shard, key, data) =>
      val lineIdx = data.split(":")(1).toInt
      val base = KinesisSim.shardFor(key, 3)
      val want =
        if (lineIdx >= 15 && (base == 0 || base == 2)) 3 else base
      assert(shard === want, s"line $lineIdx key $key in shard $shard")
    }
    // both parents closed at the epoch
    assert(rows.filter(r => r._2 == 0 || r._2 == 2)
      .forall(_._4.split(":")(1).toInt < 15))
    // the child waits for BOTH parents
    val parentBatches = rows.filter(r => r._2 == 0 || r._2 == 2).map(_._1)
    val childBatches = rows.filter(_._2 == 3).map(_._1)
    if (parentBatches.nonEmpty && childBatches.nonEmpty)
      assert(parentBatches.max < childBatches.min)
  }

  test("end-to-end: demux + idempotent sink survive the reshard epoch (conservation, replay-safe)") {
    // envelope lines whose partition key is the record ID; the epoch
    // mid-stream splits shard 0 — the pk→shard contract changes, the
    // demux pipeline must neither lose nor duplicate records
    def line(table: String, id: Int): String =
      s"""{"data": {"ID": $id}, "metadata": {"timestamp": "2019-11-13T09:59:${10 + id % 40}.000000Z", "record-type": "data", "operation": "load", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "$table"}}"""
    val lines = (0 until 30).map(i =>
      line(if (i % 3 == 0) "seat" else "person", i))
    val path = writeBacklog(lines)
    val out = Files.createTempDirectory("ksplit_reshard").toString
    val ckpt = Files.createTempDirectory("kckpt_reshard").toString
    def run(): Unit = {
      val raw = spark.readStream.format("graft-kinesis-sim")
        .option("path", path)
        .option("keyRegex", "\"ID\": ([0-9]+)")
        .option("reshardAtLine", "15").option("reshardShard", "0")
        .option("maxRecordsPerTrigger", "4")
        .load()
        .select(col("data").as("value"))
      val q = StreamingDemux.splitStream(
        StreamingDemux.parseEnvelopes(raw), out, ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    run()
    val split = spark.read.parquet(out)
    assert(split.count() === 30)
    assert(split.filter(col("table_name") === "seat").count() === 10)
    assert(split.filter(col("table_name") === "person").count() === 20)
    assert(split.select(get_json_object(col("data"), "$.ID"))
      .distinct().count() === 30)
    // replay from the same checkpoint: nothing re-lands (idempotent
    // across the epoch boundary, not just within one topology)
    run()
    assert(spark.read.parquet(out).count() === 30)
  }

  test("MULTI-EPOCH reshard: a split child re-splits — conservation, chained routing, transitive ancestor ordering") {
    // shards=2; epoch 0 at line 20 splits shard 0 -> children 2,3
    // (event-0 parity); epoch 1 at line 40 splits CHILD 2 -> children
    // 4,5 (event-1 parity — a fresh draw, else every key in child 2
    // would land in one grandchild)
    val lines = (0 until 60).map(i => s"b${i % 10}:$i")
    val path = writeBacklog(lines)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, Long, String)]
    val q = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "2")
      .option("keyRegex", "(b[0-9]+):")
      .option("reshards", "split@20:0;split@40:2")
      .option("maxRecordsPerTrigger", "4")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("shardId", "partitionKey", "sequenceNumber",
            "data")
          .collect()
          .map(r => (id, r.getInt(0), r.getString(1), r.getLong(2),
            r.getString(3)))
        buf.synchronized { buf ++= rows }; ()
      }.start()
    q.awaitTermination(120000)
    val rows = buf.toSeq
    // conservation across BOTH epochs: every line exactly once
    assert(rows.map(_._5).sorted === lines.sorted)
    // chained routing re-derived independently
    rows.foreach { case (_, shard, key, _, data) =>
      val lineIdx = data.split(":")(1).toInt
      var want = KinesisSim.shardFor(key, 2)
      if (lineIdx >= 20 && want == 0) want = 2 + KinesisSim.childFor(key, 0)
      if (lineIdx >= 40 && want == 2) want = 4 + KinesisSim.childFor(key, 1)
      assert(shard === want, s"line $lineIdx key $key in shard $shard")
    }
    // the event-1 parity genuinely divides child 2's keys: both
    // grandchildren received records (under one fixed parity every
    // key in child 2 would land in the same grandchild)
    assert(rows.exists(_._2 == 4) && rows.exists(_._2 == 5),
      "re-splitting a child must divide its keys across both " +
        "grandchildren")
    // closed shards only ever held their epoch's records
    assert(rows.filter(_._2 == 0).forall(_._5.split(":")(1).toInt < 20))
    assert(rows.filter(_._2 == 2).forall { r =>
      val i = r._5.split(":")(1).toInt; i >= 20 && i < 40
    })
    // transitive KCL ordering: child 2 after parent 0 drains;
    // grandchildren 4,5 after BOTH ancestors (0 and 2) drain
    def batches(s: Int) = rows.filter(_._2 == s).map(_._1)
    assert(batches(0).max < batches(2).min,
      "child 2 advanced before parent 0 drained")
    val grand = (batches(4) ++ batches(5))
    assert(batches(2).max < grand.min,
      "grandchildren advanced before their parent (2) drained")
    assert(batches(0).max < grand.min,
      "grandchildren advanced before their grandparent (0) drained")
    // ⇒ per-key order survives both epochs
    rows.groupBy(_._3).foreach { case (key, rs) =>
      val ordered = rs.sortBy(r => (r._1, r._4))
        .map(_._5.split(":")(1).toInt)
      assert(ordered === ordered.sorted,
        s"key $key delivered out of order: $ordered")
    }
  }

  test("MULTI-EPOCH split-then-merge: a merge child waits on ancestors from BOTH lineages (incl. through an empty intermediate)") {
    // shards=2; epoch 0 at line 15 splits shard 0 -> 2,3; epoch 1 at
    // line 30 merges shard 1 with CHILD 2 -> 4. Child 4's transitive
    // ancestors are {1, 2, 0}: even if the intermediate child 2 held
    // few (or zero) records, 4 must not advance before 0 drains.
    val lines = (0 until 45).map(i => s"b${i % 8}:$i")
    val path = writeBacklog(lines)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, Long, String)]
    val q = spark.readStream.format("graft-kinesis-sim")
      .option("path", path).option("shards", "2")
      .option("keyRegex", "(b[0-9]+):")
      .option("reshards", "split@15:0;merge@30:1+2")
      .option("maxRecordsPerTrigger", "3")
      .load()
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select("shardId", "partitionKey", "sequenceNumber",
            "data")
          .collect()
          .map(r => (id, r.getInt(0), r.getString(1), r.getLong(2),
            r.getString(3)))
        buf.synchronized { buf ++= rows }; ()
      }.start()
    q.awaitTermination(120000)
    val rows = buf.toSeq
    assert(rows.map(_._5).sorted === lines.sorted)
    rows.foreach { case (_, shard, key, _, data) =>
      val lineIdx = data.split(":")(1).toInt
      var want = KinesisSim.shardFor(key, 2)
      if (lineIdx >= 15 && want == 0) want = 2 + KinesisSim.childFor(key, 0)
      if (lineIdx >= 30 && (want == 1 || want == 2)) want = 4
      assert(shard === want, s"line $lineIdx key $key in shard $shard")
    }
    def batches(s: Int) = rows.filter(_._2 == s).map(_._1)
    val child4 = batches(4)
    assert(child4.nonEmpty)
    Seq(0, 1, 2).filter(batches(_).nonEmpty).foreach { anc =>
      assert(batches(anc).max < child4.min,
        s"merge child advanced before ancestor $anc drained")
    }
    rows.groupBy(_._3).foreach { case (key, rs) =>
      val ordered = rs.sortBy(r => (r._1, r._4))
        .map(_._5.split(":")(1).toInt)
      assert(ordered === ordered.sorted,
        s"key $key delivered out of order: $ordered")
    }
  }

  test("the committed offsets RECORD the topology: editing reshard options across a restart fails loudly") {
    def stream(opts: (String, String)*) = new KinesisSimStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(
          (Seq("path" -> "/dev/null") ++ opts).toMap).asJava))
    val all = org.apache.spark.sql.connector.read.streaming
      .ReadLimit.allAvailable()
    // the token round-trips through the offset JSON
    val withTopo = ShardOffsets(Map(0 -> 1L, 1 -> 2L),
      Some("split@20:0;merge@30:1+2"))
    assert(ShardOffsets.parse(withTopo.json()) === withTopo)
    assert(ShardOffsets.parse(ShardOffsets(Map(0 -> 1L)).json()) ===
      ShardOffsets(Map(0 -> 1L)))
    // reshard ADDED after the checkpoint was built: same shard count
    // would even be possible post-drain — requireKnownShards can't see
    // it, the topology token does
    val legacy = ShardOffsets(Map(0 -> 0L, 1 -> 0L))
    val e1 = intercept[IllegalStateException] {
      stream("shards" -> "2", "reshardAtLine" -> "5")
        .latestOffset(legacy, all)
    }
    assert(e1.getMessage.contains("topology") &&
      e1.getMessage.contains("<none>"))
    // reshard REMOVED (or changed) after the checkpoint recorded one
    val ckptd = ShardOffsets(Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 0L),
      Some("split@5:0"))
    val e2 = intercept[IllegalStateException] {
      stream("shards" -> "4").latestOffset(ckptd, all)
    }
    assert(e2.getMessage.contains("topology"))
    val e3 = intercept[IllegalStateException] {
      stream("shards" -> "2", "reshardAtLine" -> "7")
        .latestOffset(ckptd, all)
    }
    assert(e3.getMessage.contains("split@5:0") &&
      e3.getMessage.contains("split@7:0"))
    // matching topology (written via either syntax) passes
    val path = writeBacklog((0 until 4).map(i => envLine("person", i)))
    stream("path" -> path, "shards" -> "2", "reshardAtLine" -> "5")
      .latestOffset(ShardOffsets(Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 0L),
        Some("split@5:0")), all)
    stream("path" -> path, "shards" -> "2", "reshards" -> "split@5:0")
      .latestOffset(ShardOffsets(Map(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 0L),
        Some("split@5:0")), all)
  }

  test("a RESTART under edited reshard options fails the query loudly, end to end through the checkpoint") {
    val lines = (0 until 12).map(i => s"k${i % 4}:$i")
    val path = writeBacklog(lines)
    val ckpt = Files.createTempDirectory("kckpt_topo").toString
    val out = Files.createTempDirectory("kout_topo").toString
    def run(reshards: String): Unit = {
      val q = spark.readStream.format("graft-kinesis-sim")
        .option("path", path).option("shards", "2")
        .option("keyRegex", "k([0-9]+):")
        .option("reshards", reshards)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run("split@6:0")
    assert(spark.read.parquet(out).count() === 12)
    // restart with the epoch MOVED: post-epoch lines would leave the
    // parent's backlog and reappear in children at sequence 0 — the
    // recorded topology refuses instead
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run("split@9:0")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("topology")))
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
