package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Constraints
import graft.streaming.IngestPipeline

/**
 * End-to-end pipeline drive + measurement: synthesize a DMS envelope
 * backlog (I/U/D ops over two tables, control records, contract
 * violations), serve it through the Kinesis-shaped source in bounded
 * micro-batches, run [[graft.streaming.IngestPipeline]] over it, and
 * report per-batch latency and sustained throughput — the numbers
 * SCALING.md's streaming section records.
 *
 * Usage: runMain graft.tools.PipelineDemo
 *          [nRecords] [maxPerTrigger] [nTables] [mergeParallelism]
 *
 * `nTables` CDC sink tables (named after the reference's dms_sample
 * schema — 16 = the full reference layout, image/image3.png) share the
 * backlog; `mergeParallelism` sets the per-batch merge fan-out (1 =
 * the serial loop, for before/after latency comparison).
 *
 * Prints one JSON line:
 * `{"records":N,"tables":T,"merge_parallelism":M,"batches":B,
 *   "wall_s":…,"records_per_s":…,"batch_ms":{"p50":…,"p95":…,"max":…},
 *   "stage_p50_ms":{"land":…,"merge":…,"rollup":…},"clean":…,
 *   "quarantined":…,"snapshot_ok":bool,"ops_ok":bool}`
 * where snapshot_ok verifies EVERY table's standing snapshot against
 * the latest-per-key fold of the backlog computed independently, and
 * ops_ok verifies the standing ops counters against the clean input's
 * group counts.
 */
object PipelineDemo {
  /** The reference's dms_sample tables (image/image3.png). */
  private val refTables = Seq(
    "person", "seat_type", "sporting_event", "sporting_event_ticket",
    "sport_type", "sport_location", "sport_team", "sport_division",
    "sport_league", "ticket_purchase_hist", "player", "name_data",
    "mlb_data", "nfl_data", "nfl_stadium_data", "seat_level")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(2000)
    val nTables = args.lift(2).map(_.toInt).getOrElse(1)
    val mergePar = args.lift(3).map(_.toInt).getOrElse(4)
    require(nTables >= 1 && nTables <= refTables.size,
      s"nTables in 1..${refTables.size}")
    val sinkTables = refTables.take(nTables)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PIPE_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- backlog: person (keyed CDC with updates+deletes), seat
    // (insert-only), controls, and contract violations (~2%: negative
    // ID). Timestamps strictly increase with i — event-time order IS
    // backlog order, so "latest per key" is computable independently.
    // proper calendar arithmetic: one second per record from a fixed
    // base — strictly increasing and parseable for ANY nRecords (a
    // field-formatted minute would overflow past 216k records and the
    // unparseable tail would silently quarantine, corrupting metrics)
    val base = java.time.Instant.parse("2019-11-13T10:00:00Z")
    def ts(i: Int): String = base.plusSeconds(i.toLong).toString
      .replace("Z", ".000000Z")
    val persons = 0 until n
    val lines = persons.map { i =>
      val ctl = i % 97 == 0
      // 1/5 of rows go to "seat" (landed + counted, never a sink) —
      // the demux-miss path; the rest spread over the sink tables
      val tbl = if (i % 5 == 4) "seat" else sinkTables(i % sinkTables.size)
      val key = i % (n / 4 + 1) // keys collide → genuine U/D churn
      val bad = !ctl && i % 50 == 13
      val id = if (bad) -key else key
      val op =
        if (i < n / 10) "load"
        else if (i % 11 == 0 && tbl != "seat") "delete"
        else if (i % 3 == 0 && tbl != "seat") "update"
        else "insert"
      val rt = if (ctl) "control" else "data"
      val data =
        if (ctl) "null"
        else s"""{"ID": $id, "val": "v$i", "bal": ${i % 1000}.5}"""
      s"""{"data": $data, "metadata": {"timestamp": "${ts(i)}", "record-type": "$rt", "operation": "$op", "partition-key-type": "primary-key", "schema-name": "dms_sample", "table-name": "$tbl"}}"""
    }
    val backlog = java.nio.file.Files.createTempFile("pipedemo", ".jsonl")
    java.nio.file.Files.write(backlog,
      lines.mkString("\n").getBytes("UTF-8"))

    val root = java.nio.file.Files.createTempDirectory("pipedemo").toString
    val personSchema = StructType(Seq(
      StructField("ID", LongType), StructField("val", StringType),
      StructField("bal", DoubleType)))
    val cfg = IngestPipeline.Config(
      landingDir = s"$root/landing",
      quarantineDir = s"$root/quarantine",
      checks = Seq(
        Constraints.Predicate("valid_id",
          // control records (data null) pass; data rows need ID >= 0
          col("data").isNull ||
            coalesce(get_json_object(col("data"), "$.ID").cast("long") >= 0,
              lit(false)),
          ),
        Constraints.NotNull("event_ts")),
      snapshotRoot = s"$root/snapshots",
      tables = sinkTables.map(tb => IngestPipeline.TableSink(
        "dms_sample", tb, personSchema, "ID")),
      opsRollupDir = s"$root/ops",
      checkpoint = s"$root/ckpt",
      mergeParallelism = mergePar)

    val raw = spark.readStream.format("graft-kinesis-sim")
      .option("path", backlog.toString)
      .option("shards", "4")
      .option("maxRecordsPerTrigger", perTrigger.toString)
      .option("keyRegex", "\"ID\": (-?[0-9]+)")
      .load()
      .select(col("data").as("value"))

    val metrics = ArrayBuffer.empty[IngestPipeline.BatchMetric]
    val t0 = System.nanoTime()
    val q = IngestPipeline.start(raw, cfg, onBatch = m => metrics.synchronized {
      metrics += m; ()
    })
    // fail loudly on timeout: proceeding would verify half-built state
    // and read the metrics buffer concurrently with the writer
    require(q.awaitTermination(600000),
      "pipeline did not drain within 600s — backlog too large for the demo")
    val wallS = (System.nanoTime() - t0) / 1e9
    val ms0 = metrics.synchronized { metrics.toIndexedSeq }

    // --- verification: snapshot == independent latest-per-key fold
    val env = spark.read
      .schema(graft.model.DmsEnvelope.rawEnvelopeSchema)
      .json(backlog.toString)
      .select(col("data"), col("metadata"))
    val dataRows = env.filter(col("data").isNotNull &&
      get_json_object(col("data"), "$.ID").cast("long") >= 0)
    val snapshotOk = sinkTables.forall { tb =>
      val tail = dataRows
        .filter(col("metadata.`table-name`") === tb)
        .select(from_json(col("data"), personSchema).as("d"),
          col("metadata.operation").as("op"),
          to_timestamp(col("metadata.timestamp")).as("seq"))
        .select(col("d.*"), col("op"), col("seq"))
      val expected = tail
        .groupBy(col("ID"))
        .agg(max_by(struct(col("val"), col("bal"), col("op")), col("seq"))
          .as("p"))
        .filter(col("p.op") =!= "delete")
        .select(col("ID"), col("p.val").as("val"), col("p.bal").as("bal"))
      val got = IngestPipeline.readSnapshot(spark, cfg, tb)
      got.count() == expected.count() &&
        got.join(expected, Seq("ID", "val", "bal"), "inner").count() ==
          expected.count()
    }

    val opsGot = IngestPipeline.opCounts(spark, cfg.opsRollupDir)
      .orderBy("table_name", "operation").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // the ops rollup counts CLEAN envelopes (controls included — they
    // are valid envelopes, just not data rows)
    val cleanEnv = env.filter(col("data").isNull ||
      get_json_object(col("data"), "$.ID").cast("long") >= 0)
    val opsWantAll = cleanEnv
      .groupBy(col("metadata.`table-name`").as("table_name"),
        col("metadata.operation").as("operation"))
      .agg(count(lit(1)).as("n"))
      .orderBy("table_name", "operation").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val opsOk = opsGot == opsWantAll

    val ms = ms0.map(_.millis.toDouble).sorted
    def pct(p: Double) =
      if (ms.isEmpty) 0.0 else ms(((ms.size - 1) * p).toInt)
    def p50(xs: Seq[Long]): Double = {
      val v = xs.map(_.toDouble).sorted
      if (v.isEmpty) 0.0 else v((v.size - 1) / 2)
    }
    val clean = ms0.map(_.clean).sum
    val bad = ms0.map(_.quarantined).sum
    println(
      f"""{"records":$n,"tables":$nTables,"merge_parallelism":$mergePar,""" +
        f""""batches":${ms0.size},"wall_s":$wallS%.1f,""" +
        f""""records_per_s":${n / wallS}%.0f,"batch_ms":{"p50":${pct(0.5)}%.0f,""" +
        f""""p95":${pct(0.95)}%.0f,"max":${if (ms.isEmpty) 0.0 else ms.last}%.0f},""" +
        f""""stage_p50_ms":{"land":${p50(ms0.map(_.landMillis))}%.0f,""" +
        f""""merge":${p50(ms0.map(_.mergeMillis))}%.0f,""" +
        f""""rollup":${p50(ms0.map(_.rollupMillis))}%.0f},""" +
        f""""clean":$clean,"quarantined":$bad,""" +
        s""""snapshot_ok":$snapshotOk,"ops_ok":$opsOk}""")
    spark.stop()
  }
}
