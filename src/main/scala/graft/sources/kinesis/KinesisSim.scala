package graft.sources.kinesis

import java.util
import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Kinesis-shaped Structured Streaming source (simulator).
 *
 * Models the stream-transport semantics of the reference's Kinesis setup
 * (reference README.md:63-67, 216) without AWS: a bounded backlog of
 * newline-delimited records is sharded by partition key (shard =
 * hash(key) mod shards, like Kinesis' MD5-range routing of
 * `partition-key-type: primary-key` records), each shard has its own
 * monotonically increasing sequence number, and each micro-batch drains
 * at most `maxRecordsPerTrigger` records per shard (the GetRecords-limit
 * analog). The output schema mirrors a Kinesis consumer record:
 *
 *   data string, partitionKey string, shardId int, sequenceNumber long,
 *   approximateArrivalTimestamp timestamp
 *
 * Options: `path` (required, file of JSON lines), `shards` (default 2 —
 * the reference's shard count), `maxRecordsPerTrigger` (default
 * unlimited), `keyRegex` (regex with 1 capture group extracting the
 * partition key from the raw line; default = whole line).
 *
 * Usage: `spark.readStream.format("graft-kinesis-sim").option("path", f)`.
 * A production deployment swaps this for the real Kinesis connector; the
 * downstream demux pipeline (StreamingDemux) is unchanged — that
 * interchangeability is the point of the envelope model.
 */
class KinesisSimProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-kinesis-sim"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisSim.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisSimTable(new CaseInsensitiveStringMap(properties))
}

object KinesisSim {
  val schema: StructType = StructType(Seq(
    StructField("data", StringType),
    StructField("partitionKey", StringType),
    StructField("shardId", IntegerType),
    StructField("sequenceNumber", LongType),
    StructField("approximateArrivalTimestamp", TimestampType)
  ))

  /** Deterministic shard routing: non-negative hash of the key mod N. */
  def shardFor(key: String, shards: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 42), shards)
}

class KinesisSimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-kinesis-sim(${options.get("path")})"
  override def schema(): StructType = KinesisSim.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisSim.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisSimStream(options)
      }
    }
}

/** Offset = per-shard next sequence number, JSON `{"0":12,"1":7}`. */
case class ShardOffsets(pos: Map[Int, Long]) extends Offset {
  override def json(): String =
    pos.toSeq.sortBy(_._1)
      .map { case (s, p) => s""""$s":$p""" }.mkString("{", ",", "}")
}

object ShardOffsets {
  def parse(json: String): ShardOffsets = ShardOffsets(
    json.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap)
}

class KinesisSimStream(options: CaseInsensitiveStringMap) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  private val path = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException("graft-kinesis-sim: 'path' is required"))
  private val shards = options.getInt("shards", 2)
  private val maxPerTrigger = options.getLong("maxRecordsPerTrigger", Long.MaxValue)
  // fail-fast option validation: a paced limit of <= 0 would pin
  // latestOffset at its start forever (AvailableNow then "drains"
  // zero records with no error), and a capture-group-less regex would
  // die batches later inside the backlog build with an
  // IndexOutOfBoundsException that never names the option
  require(maxPerTrigger > 0,
    s"graft-kinesis-sim: maxRecordsPerTrigger must be > 0 (got " +
      s"$maxPerTrigger); omit the option for unlimited")
  private val keyRegex = Option(options.get("keyRegex")).map(_.r)
  keyRegex.foreach(r => require(r.pattern.matcher("").groupCount() >= 1,
    s"graft-kinesis-sim: keyRegex '$r' has no capture group — group 1 " +
      "is the partition key"))

  /** Driver-side backlog, sharded once. Bounded by design: this is a
    * simulator for tests/benchmarks, not a service client. */
  private lazy val backlog: Map[Int, IndexedSeq[(String, String)]] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    lines.map { line =>
      val key = keyRegex.flatMap(_.findFirstMatchIn(line).map(_.group(1))).getOrElse(line)
      (KinesisSim.shardFor(key, shards), (line, key))
    }.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2) }
      .withDefaultValue(IndexedSeq.empty)
  }

  /** End of the bounded backlog, per shard. */
  private def backlogEnd: Map[Int, Long] =
    (0 until shards).map(s => s -> backlog(s).length.toLong).toMap

  /** Target frozen by Trigger.AvailableNow (drain up to here, paced). */
  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None

  override def initialOffset(): Offset =
    ShardOffsets((0 until shards).map(_ -> 0L).toMap)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(backlogEnd)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  /** A checkpointed offset naming a shard this configuration doesn't
    * have means `shards` shrank across a restart: `(0 until shards)`
    * loops would silently DROP the extra shards' positions — and their
    * unread records — from every subsequent offset. Kinesis resharding
    * is a new stream epoch, not a config edit; fail loudly. */
  private def requireKnownShards(pos: Map[Int, Long]): Unit = {
    val unknown = pos.keys.filter(_ >= shards)
    require(unknown.isEmpty,
      s"graft-kinesis-sim: checkpoint offset names shard(s) " +
        s"${unknown.toSeq.sorted.mkString(",")} but 'shards'=$shards — " +
        "the shard count shrank across a restart; restore the original " +
        "count or start a fresh checkpoint")
  }

  /** Admission control: per-shard GetRecords-limit analog — each batch
    * advances a shard by at most `maxRecordsPerTrigger`. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffsets].pos
    requireKnownShards(s)
    val target = availableNowTarget.getOrElse(backlogEnd)
    ShardOffsets((0 until shards).map { sh =>
      val from = s.getOrElse(sh, 0L)
      val capped = // saturating: from + maxPerTrigger can overflow Long
        if (maxPerTrigger > Long.MaxValue - from) Long.MaxValue
        else from + maxPerTrigger
      sh -> math.min(target.getOrElse(sh, 0L), capped)
    }.toMap)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = ShardOffsets(backlogEnd)

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].pos
    val e = end.asInstanceOf[ShardOffsets].pos
    requireKnownShards(s)
    (0 until shards).flatMap { shard =>
      val from = s.getOrElse(shard, 0L)
      val to = e.getOrElse(shard, 0L)
      if (to > from)
        Some(KinesisSimPartition(shard, from,
          backlog(shard).slice(from.toInt, to.toInt).toArray))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[KinesisSimPartition]
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < kp.records.length }
          override def get(): InternalRow = {
            val (line, key) = kp.records(i)
            val seq = kp.firstSeq + i
            // deterministic arrival time: epoch + seq ms (micros)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(line), UTF8String.fromString(key),
              kp.shard, seq, 1700000000000000L + seq * 1000L))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class KinesisSimPartition(shard: Int, firstSeq: Long,
    records: Array[(String, String)]) extends InputPartition
