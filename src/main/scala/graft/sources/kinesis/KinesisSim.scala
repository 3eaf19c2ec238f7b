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
 * RESHARDING (the one stream-transport behavior a fixed-shard sim
 * missed — real streams split/merge shards under load, and S2's
 * pk→shard contract changes mid-stream at that epoch):
 * `reshardAtLine` = N marks an epoch at global line index N;
 * `reshardOp` = `split` (default) closes parent `reshardShard` and
 * opens two NEW child shard ids (`shards`, `shards+1`) that divide the
 * parent's key space (hash parity — the hash-range-split analog), or
 * `merge` closes the two shards in `reshardShards` = "a,b" and opens
 * one child (`shards`) owning both key spaces. Lines before the epoch
 * route with the original mapping; lines at/after it route split/merge
 * keys to their child. Closed shards stop growing; child shards start
 * their own sequence numbers at 0 (new shards, not renamed ones — the
 * Kinesis model). Admission control enforces the KCL's parent-before-
 * child ordering: child shards do not advance until every closed
 * parent is fully drained, so per-key record order survives the epoch
 * boundary (spec-asserted, including through the demux + idempotent
 * sinks).
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

  /** Which of a split parent's two children owns `key` — hash parity,
    * the hash-range-split analog (independent seed from [[shardFor]] so
    * the child split doesn't correlate with the parent routing). */
  def childFor(key: String): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 43), 2)

  /** A mid-stream reshard event at global line index `atLine`. */
  sealed trait Reshard { def atLine: Long }
  /** Shard `parent` closes; children (ids `shards`, `shards+1`) divide
    * its key space by [[childFor]]. */
  case class Split(atLine: Long, parent: Int) extends Reshard
  /** Shards `a` and `b` close; one child (id `shards`) owns both key
    * spaces. */
  case class Merge(atLine: Long, a: Int, b: Int) extends Reshard
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

  /** Optional mid-stream reshard epoch (see the class doc). */
  private val reshard: Option[KinesisSim.Reshard] =
    Option(options.get("reshardAtLine")).map(_.toLong).map { at =>
      require(at >= 0,
        s"graft-kinesis-sim: reshardAtLine must be >= 0 (got $at)")
      options.getOrDefault("reshardOp", "split") match {
        case "split" =>
          val p = options.getInt("reshardShard", 0)
          require(p >= 0 && p < shards,
            s"graft-kinesis-sim: reshardShard $p out of range " +
              s"[0, $shards)")
          KinesisSim.Split(at, p)
        case "merge" =>
          val spec = Option(options.get("reshardShards")).getOrElse(
            throw new IllegalArgumentException(
              "graft-kinesis-sim: reshardOp=merge needs " +
                "reshardShards=\"a,b\""))
          val parts = spec.split(",").map(_.trim)
          require(parts.length == 2 && parts.forall(_.toIntOption.isDefined),
            s"graft-kinesis-sim: reshardShards '$spec' must be two " +
              "comma-separated shard ids, e.g. \"0,2\"")
          val Array(a, b) = parts.map(_.toInt)
          require(a != b && a >= 0 && a < shards && b >= 0 && b < shards,
            s"graft-kinesis-sim: reshardShards '$spec' must name two " +
              s"distinct shards in [0, $shards)")
          KinesisSim.Merge(at, a, b)
        case other => throw new IllegalArgumentException(
          s"graft-kinesis-sim: reshardOp must be split or merge, got " +
            s"'$other'")
      }
    }

  /** NEW shard ids the reshard opens (children) — empty without one. */
  private val childIds: Seq[Int] = reshard match {
    case Some(_: KinesisSim.Split) => Seq(shards, shards + 1)
    case Some(_: KinesisSim.Merge) => Seq(shards)
    case None                      => Seq.empty
  }

  /** Shards the reshard CLOSES — they stop growing at the epoch and
    * must drain before any child advances (KCL parent-before-child). */
  private val closedIds: Seq[Int] = reshard match {
    case Some(KinesisSim.Split(_, p))    => Seq(p)
    case Some(KinesisSim.Merge(_, a, b)) => Seq(a, b)
    case None                            => Seq.empty
  }

  /** Every shard id this stream configuration can emit. */
  private val allShardIds: Seq[Int] = (0 until shards) ++ childIds

  /** The shard a line routes to, honoring the reshard epoch. */
  private def routeFor(lineIdx: Long, key: String): Int = {
    val base = KinesisSim.shardFor(key, shards)
    reshard match {
      case Some(r) if lineIdx >= r.atLine => r match {
        case KinesisSim.Split(_, p) if base == p =>
          shards + KinesisSim.childFor(key)
        case KinesisSim.Merge(_, a, b) if base == a || base == b =>
          shards
        case _ => base
      }
      case _ => base
    }
  }

  /** Driver-side backlog, sharded once. Bounded by design: this is a
    * simulator for tests/benchmarks, not a service client. */
  private lazy val backlog: Map[Int, IndexedSeq[(String, String)]] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    lines.zipWithIndex.map { case (line, idx) =>
      val key = keyRegex.flatMap(_.findFirstMatchIn(line).map(_.group(1))).getOrElse(line)
      (routeFor(idx.toLong, key), (line, key))
    }.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2) }
      .withDefaultValue(IndexedSeq.empty)
  }

  /** End of the bounded backlog, per shard. */
  private def backlogEnd: Map[Int, Long] =
    allShardIds.map(s => s -> backlog(s).length.toLong).toMap

  /** Target frozen by Trigger.AvailableNow (drain up to here, paced). */
  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None

  override def initialOffset(): Offset =
    ShardOffsets(allShardIds.map(_ -> 0L).toMap)

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
    val known = allShardIds.toSet
    val unknown = pos.keys.filterNot(known)
    require(unknown.isEmpty,
      s"graft-kinesis-sim: checkpoint offset names shard(s) " +
        s"${unknown.toSeq.sorted.mkString(",")} but 'shards'=$shards" +
        (if (reshard.isEmpty) "" else s" (+children ${childIds.mkString(",")})") +
        " — the shard count shrank across a restart (or a reshard " +
        "option was removed); restore the original configuration or " +
        "start a fresh checkpoint")
  }

  /** Admission control: per-shard GetRecords-limit analog — each batch
    * advances a shard by at most `maxRecordsPerTrigger`. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffsets].pos
    requireKnownShards(s)
    val target = availableNowTarget.getOrElse(backlogEnd)
    // KCL parent-before-child: until every closed parent is fully
    // drained (as of this batch's START), the reshard's child shards
    // hold at their current position — per-key order survives the
    // epoch (a key's pre-epoch records all live in its parent)
    val parentsDrained = closedIds.forall(p =>
      s.getOrElse(p, 0L) >= backlog(p).length.toLong)
    ShardOffsets(allShardIds.map { sh =>
      val from = s.getOrElse(sh, 0L)
      val capped = // saturating: from + maxPerTrigger can overflow Long
        if (maxPerTrigger > Long.MaxValue - from) Long.MaxValue
        else from + maxPerTrigger
      sh ->
        (if (childIds.contains(sh) && !parentsDrained) from
         else math.min(target.getOrElse(sh, 0L), capped))
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
    allShardIds.flatMap { shard =>
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
