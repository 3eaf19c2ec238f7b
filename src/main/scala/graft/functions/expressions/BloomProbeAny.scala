package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * `probe_any(bloom, hashes)` — does a serialized bloom filter possibly
 * contain ANY of the given 64-bit hashes?
 *
 * Exists because Spark's own `might_contain`
 * (`BloomFilterMightContain`) requires the bloom side to be a CONSTANT
 * (it deserializes once at plan time) — the right contract for a
 * runtime join filter, but useless for a bloom-PER-ROW stats table
 * like [[graft.operators.BloomIndex]], where each file's bloom is a
 * binary column value. This expression deserializes the row's bloom
 * once and tests the whole probe array against it, so an IN-list probe
 * of k values costs one deserialization + k bit tests per FILE (the
 * stats table has one row per file — cold catalog-side path, never the
 * data hot path; nullSafeEval is the honest implementation and codegen
 * just calls the same static helper).
 *
 * Bloom bytes must come from [[graft.functions.GraftFunctions.graftBloomAgg]]
 * (Spark's `BloomFilterAggregate` serialization); hashes must be the
 * same `xxhash64` applied at build time. NULL bloom or NULL hashes →
 * NULL (a pruning filter drops the row); a NULL element inside the
 * array is skipped — no equality probe matches NULL.
 */
case class BloomProbeAny(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = BooleanType

  override def inputTypes = Seq(BinaryType, ArrayType(LongType))

  override protected def nullSafeEval(bloom: Any, hashes: Any): Any =
    BloomProbeAny.probe(bloom.asInstanceOf[Array[Byte]],
      hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.expressions.BloomProbeAny.probe($b, $h)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomProbeAny =
    copy(left = newLeft, right = newRight)
}

object BloomProbeAny {
  /** One deserialization, then a bit test per probe hash. */
  def probe(bloomBytes: Array[Byte], hashes: ArrayData): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (!hashes.isNullAt(i) && bf.mightContainLong(hashes.getLong(i)))
        return true
      i += 1
    }
    false
  }
}
