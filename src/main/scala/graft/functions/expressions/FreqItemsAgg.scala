package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries frequent-items (heavy hitters) summary as ONE object
 * aggregate over a string column — the mergeable-sketch answer to
 * "top tokens / vocabulary" at 100 TB, where an exact groupBy's shuffle
 * is keyed by every distinct token but the summary is k-bounded per
 * partition and merges associatively (Agarwal et al., "Mergeable
 * Summaries", PODS'12 — public literature).
 *
 *  - update: increment a tracked item / claim a free slot (< k−1
 *    tracked) / decrement every counter (the MG step);
 *  - merge: sum counters, then subtract the k-th largest combined
 *    count and drop non-positives (each merge call is deterministic —
 *    ties broken by item bytes);
 *  - eval: array of (item, count) structs, count desc then item asc.
 *
 * Guarantees: any item with true frequency > n/k is present; reported
 * counts are lower bounds undercounting by at most n/k. These hold
 * regardless of partial-merge ORDER, but in the lossy regime the
 * summary CONTENTS below the n/k line are merge-order dependent (the
 * cut step is not associative) — like any composed MG sketch, do not
 * hash-compare lossy output. When k−1 ≥ the true distinct count, no
 * decrement or cut ever fires and the summary is EXACT and fully
 * deterministic — the regime the driver query runs in (31-token
 * vocabulary, k = 64), which is what makes it hash-verifiable
 * cross-engine.
 */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 2, s"k must be >= 2, got $k")

  private val slots = k - 1

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < slots => buf.update(item.clone(), 1L)
        case None =>
          // MG decrement: every counter down one, drop zeros
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (it, c) =>
            if (c <= 1L) dead += it else buf.update(it, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (it, c) => a.update(it, a.getOrElse(it, 0L) + c) }
    if (a.size > slots) {
      // subtract the (slots+1)-th largest count, deterministically
      // (count desc, item asc) so merge order cannot matter
      val sorted = a.toSeq.sortBy { case (it, c) => (-c, it) }
      val cut = sorted(slots)._2
      a.clear()
      sorted.take(slots).foreach { case (it, c) =>
        if (c - cut > 0) a.update(it, c - cut)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (it, c) => (-c, it) }
    new GenericArrayData(sorted.map { case (it, c) =>
      InternalRow(it, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = buf.toSeq
    val byteLen = 4 + items.map { case (it, _) => 4 + it.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(byteLen)
    bb.putInt(items.size)
    items.foreach { case (it, c) =>
      val bytes = it.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
