package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * MinHash signature as ONE aggregate: buffer = Array[Long](numHashes) of
 * per-permutation minima, updated in a tight JVM loop per shingle hash.
 *
 * Alternative to `numHashes` separate `min()` aggregate buffers: one
 * object buffer, one update call per row, cache-friendly coefficient
 * arrays, trivial merge (elementwise min) — and no 64-wide generated
 * aggregate class to compile. Permutations are (a·h + b) mod p with h a
 * 32-bit non-negative shingle hash widened to long (products < 2^62 —
 * no overflow).
 */
case class MinHashSigAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val (ai, bi) = MinHashSigAgg.permCoeffs(i)
      a(i) = ai
      b(i) = bi
      i += 1
    }
    (a, b)
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(MinHashSigAgg.P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val p = (h * as(i) + bs(i)) % MinHashSigAgg.P
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  val P = 2147483647L // 2^31 - 1

  /** THE canonical permutation-coefficient derivation — the SQL
    * aggregate, `Dedup`'s codegen'd explode+agg path, and the
    * generated oracle SQL must all draw the same (a, b) per hash
    * index or signatures silently stop matching across paths; every
    * caller delegates here. */
  def permCoeffs(i: Int): (Long, Long) = {
    val a = 1L + 2 * ((1103515245L * i + 12345) % 1073741823L) // odd, < 2^31
    val b = (1103515245L * (i + 7919) + 12345) % P
    (a, b)
  }
}
