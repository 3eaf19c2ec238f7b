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
 * ANCESTOR is fully drained (transitive, because an intermediate child
 * can be empty), so per-key record order survives the epoch boundary
 * (spec-asserted, including through the demux + idempotent sinks).
 *
 * MULTI-EPOCH resharding — real streams under sustained load reshard
 * repeatedly, and children reshard again: `reshards` gives a
 * ;-separated event sequence in strictly increasing line order, each
 * `split@LINE:PARENT` or `merge@LINE:A+B`, where later events may name
 * child ids earlier events opened (ids are assigned in event order:
 * a split opens the next two, a merge the next one). Each split
 * divides by its own hash-parity draw (the event index salts the
 * seed) so re-splitting a child genuinely divides its keys.
 * `reshards` and the single-event options are mutually exclusive.
 *
 * The committed offsets RECORD the reshard topology: editing the
 * reshard options across a restart (adding, removing, or changing
 * events) re-partitions the backlog — post-epoch lines would leave a
 * parent's backlog and reappear in a child at sequence 0, silently
 * re-delivering records the old topology already consumed — so a
 * restart whose configured topology differs from the checkpoint's
 * fails loudly instead (resharding is a new stream epoch, not a
 * config edit).
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
    * the child split doesn't correlate with the parent routing).
    * `event` salts the seed per reshard event: a child that splits
    * AGAIN must divide its keys by a fresh draw — under one fixed
    * parity every key the child holds would land in the same
    * grandchild. Event 0 is the original seed (43). */
  def childFor(key: String, event: Int = 0): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, 43 + event), 2)

  /** A mid-stream reshard event at global line index `atLine`. */
  sealed trait Reshard { def atLine: Long }
  /** Shard `parent` closes; two fresh-id children divide its key space
    * by [[childFor]] under the event's own seed. */
  case class Split(atLine: Long, parent: Int) extends Reshard
  /** Shards `a` and `b` close; one fresh-id child owns both key
    * spaces. */
  case class Merge(atLine: Long, a: Int, b: Int) extends Reshard

  /** Parse the `reshards` option: `split@LINE:PARENT` /
    * `merge@LINE:A+B`, ;-separated. Purely syntactic — topology
    * validation (open parents, increasing lines) happens where the
    * shard count is known. */
  def parseReshards(spec: String): Seq[Reshard] =
    spec.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { ev =>
      def bad(why: String) = throw new IllegalArgumentException(
        s"graft-kinesis-sim: reshards event '$ev' $why — expected " +
          "split@LINE:PARENT or merge@LINE:A+B")
      ev.split("@") match {
        case Array(op, rest) => rest.split(":") match {
          case Array(at, args) =>
            val line = at.toLongOption.getOrElse(bad("has a non-numeric line"))
            (op, args.split("\\+").map(_.trim)) match {
              case ("split", Array(p)) =>
                Split(line, p.toIntOption.getOrElse(bad("has a non-numeric parent")))
              case ("merge", Array(a, b))
                  if a.toIntOption.isDefined && b.toIntOption.isDefined =>
                Merge(line, a.toInt, b.toInt)
              case _ => bad("has malformed arguments")
            }
          case _ => bad("is missing ':ARGS'")
        }
        case _ => bad("is missing '@LINE'")
      }
    }

  /** The canonical topology token committed into offsets — one string
    * per configuration, so a restart under different reshard options
    * is detectable as a plain inequality. */
  def renderReshards(evs: Seq[Reshard]): String = evs.map {
    case Split(at, p)    => s"split@$at:$p"
    case Merge(at, a, b) => s"merge@$at:$a+$b"
  }.mkString(";")
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

/** Offset = per-shard next sequence number, JSON `{"0":12,"1":7}`;
  * when the stream is configured with reshard events the canonical
  * topology token rides along (`"reshard":"split@20:0"`), so a restart
  * under edited reshard options fails loudly instead of silently
  * re-partitioning the backlog. The token's grammar has no commas or
  * braces (merge args join with `+`), keeping the flat parse below
  * correct. */
case class ShardOffsets(pos: Map[Int, Long],
    topo: Option[String] = None) extends Offset {
  override def json(): String =
    (pos.toSeq.sortBy(_._1).map { case (s, p) => s""""$s":$p""" } ++
      topo.map(t => s""""reshard":"$t""""))
      .mkString("{", ",", "}")
}

object ShardOffsets {
  def parse(json: String): ShardOffsets = {
    val kvs = json.trim.stripPrefix("{").stripSuffix("}").split(",")
      .filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim
      }
    val (topo, shards) = kvs.partition(_._1 == "reshard")
    ShardOffsets(
      shards.map { case (k, v) => k.toInt -> v.toLong }.toMap,
      topo.headOption.map(_._2.stripPrefix("\"").stripSuffix("\"")))
  }
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

  /** Mid-stream reshard epochs (see the class doc): the `reshards`
    * sequence, or the legacy single-event options mapped onto a
    * one-event sequence — never both. */
  private val reshards: Seq[KinesisSim.Reshard] = {
    val multi = Option(options.get("reshards")).map(KinesisSim.parseReshards)
    val single = Option(options.get("reshardAtLine")).map(_.toLong).map { at =>
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
    require(multi.isEmpty || single.isEmpty,
      "graft-kinesis-sim: 'reshards' and 'reshardAtLine' are mutually " +
        "exclusive — express the single event in the 'reshards' syntax")
    multi.getOrElse(single.toSeq)
  }

  /** The resolved topology: each event paired with the child ids it
    * OPENS (assigned in event order — a split takes the next two, a
    * merge the next one), with the open-shard set threaded through so
    * an event can only name shards that exist and are open when it
    * fires. Lines must strictly increase: two events at one line have
    * no defined routing order. */
  private val topology: Seq[(KinesisSim.Reshard, Seq[Int])] = {
    var next = shards
    var open = (0 until shards).toSet
    reshards.zipWithIndex.map { case (ev, i) =>
      require(ev.atLine >= 0,
        s"graft-kinesis-sim: reshard event $i line ${ev.atLine} < 0")
      require(i == 0 || ev.atLine > reshards(i - 1).atLine,
        s"graft-kinesis-sim: reshard events must be in strictly " +
          s"increasing line order (event $i at line ${ev.atLine} after " +
          s"line ${reshards(i - 1).atLine})")
      val kids = ev match {
        case KinesisSim.Split(_, p) =>
          require(open(p), s"graft-kinesis-sim: reshard event $i splits " +
            s"shard $p, which is not open at line ${ev.atLine} (open: " +
            s"${open.toSeq.sorted.mkString(",")})")
          open -= p
          Seq(next, next + 1)
        case KinesisSim.Merge(_, a, b) =>
          require(a != b && open(a) && open(b),
            s"graft-kinesis-sim: reshard event $i merges shards $a+$b, " +
              s"which must be two distinct open shards at line " +
              s"${ev.atLine} (open: ${open.toSeq.sorted.mkString(",")})")
          open --= Seq(a, b)
          Seq(next)
      }
      next += kids.length
      open ++= kids
      (ev, kids)
    }
  }

  /** NEW shard ids the reshards open (children) — empty without any. */
  private val childIds: Seq[Int] = topology.flatMap(_._2)

  /** Per-child CLOSED ancestors, transitively: a child may not advance
    * until every one of these is fully drained. Immediate parents are
    * not enough — an intermediate child with an EMPTY backlog counts
    * as drained instantly, which would let a grandchild advance while
    * the grandparent still holds the keys' earlier records. */
  private val ancestorsOf: Map[Int, Set[Int]] =
    topology.foldLeft(Map.empty[Int, Set[Int]]) { case (acc, (ev, kids)) =>
      val parents = ev match {
        case KinesisSim.Split(_, p)    => Set(p)
        case KinesisSim.Merge(_, a, b) => Set(a, b)
      }
      val anc = parents ++ parents.flatMap(p => acc.getOrElse(p, Set.empty))
      acc ++ kids.map(_ -> anc)
    }

  /** Every shard id this stream configuration can emit. */
  private val allShardIds: Seq[Int] = (0 until shards) ++ childIds

  /** The canonical topology token committed into every offset. */
  private val topoToken: Option[String] =
    if (reshards.isEmpty) None
    else Some(KinesisSim.renderReshards(reshards))

  /** The shard a line routes to: the base hash mapping, then each
    * fired epoch in order — a key's route can chain through several
    * events (a split child re-splitting, a merged child splitting). */
  private def routeFor(lineIdx: Long, key: String): Int = {
    var cur = KinesisSim.shardFor(key, shards)
    topology.zipWithIndex.foreach { case ((ev, kids), i) =>
      if (lineIdx >= ev.atLine) ev match {
        case KinesisSim.Split(_, p) if cur == p =>
          cur = kids.head + KinesisSim.childFor(key, i)
        case KinesisSim.Merge(_, a, b) if cur == a || cur == b =>
          cur = kids.head
        case _ => ()
      }
    }
    cur
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
    ShardOffsets(allShardIds.map(_ -> 0L).toMap, topoToken)

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
        (if (reshards.isEmpty) "" else s" (+children ${childIds.mkString(",")})") +
        " — the shard count shrank across a restart (or a reshard " +
        "option was removed); restore the original configuration or " +
        "start a fresh checkpoint")
  }

  /** The checkpoint's recorded topology must equal this
    * configuration's. Shard-id checks alone cannot catch every edit:
    * reshard options ADDED after the checkpoint was built (or a
    * changed line/parent at the same shard count) pass
    * [[requireKnownShards]] but re-partition the backlog — post-epoch
    * lines leave the parent's backlog and reappear in child shards at
    * sequence 0, re-delivering records the old topology already
    * consumed. Resharding is a new stream epoch; fail loudly. */
  private def requireSameTopology(o: ShardOffsets): Unit =
    if (o.topo != topoToken)
      throw new IllegalStateException(
        s"graft-kinesis-sim: the checkpoint was built with reshard " +
          s"topology ${o.topo.getOrElse("<none>")} but this restart " +
          s"configures ${topoToken.getOrElse("<none>")} — editing " +
          "reshard options re-partitions the backlog and re-delivers " +
          "consumed records; restore the original configuration or " +
          "start a fresh checkpoint")

  private def checkStart(o: ShardOffsets): Unit = {
    requireKnownShards(o.pos)
    requireSameTopology(o)
  }

  /** Admission control: per-shard GetRecords-limit analog — each batch
    * advances a shard by at most `maxRecordsPerTrigger`. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val o = start.asInstanceOf[ShardOffsets]
    checkStart(o)
    val s = o.pos
    val target = availableNowTarget.getOrElse(backlogEnd)
    // KCL parent-before-child: until every closed ANCESTOR of a child
    // is fully drained (as of this batch's START), the child holds at
    // its current position — per-key order survives each epoch (a
    // key's pre-epoch records all live along its ancestor chain)
    def drained(p: Int): Boolean =
      s.getOrElse(p, 0L) >= backlog(p).length.toLong
    ShardOffsets(allShardIds.map { sh =>
      val from = s.getOrElse(sh, 0L)
      val capped = // saturating: from + maxPerTrigger can overflow Long
        if (maxPerTrigger > Long.MaxValue - from) Long.MaxValue
        else from + maxPerTrigger
      sh ->
        (if (ancestorsOf.getOrElse(sh, Set.empty).exists(!drained(_))) from
         else math.min(target.getOrElse(sh, 0L), capped))
    }.toMap, topoToken)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset =
    ShardOffsets(backlogEnd, topoToken)

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[ShardOffsets]
    val s = so.pos
    val e = end.asInstanceOf[ShardOffsets].pos
    checkStart(so)
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
