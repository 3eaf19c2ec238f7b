package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native portable 60-bit hash: the first 15 hex digits of md5(input)
 * as a long — bit-identical to the SQL form
 * `conv(substring(md5(s), 1, 15), 16, 10)` (H60Properties pins the
 * equivalence) and to DuckDB's `('0x' || substr(md5(s), 1, 15))::BIGINT`
 * oracle mirror, but ~3× cheaper per call: one thread-local digest
 * reused across rows (the SQL chain allocates a MessageDigest AND
 * round-trips through a 32-char hex string and a base-16 string parser
 * per value). This sits under EVERY portable-mode hash — each MinHash
 * shingle occurrence (millions per bench run, billions at 100 TB),
 * fingerprints, dataset-split buckets — so the constant factor is the
 * dominant cost of the whole q19/q20/q91/q99 family.
 */
case class H60Hash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def dataType: DataType = LongType

  // a non-string SQL argument fails analysis (implicit-castable to
  // string where Spark allows it), instead of a runtime ClassCast /
  // codegen compile failure — the up-front-validation discipline the
  // other registered functions follow (foldableIntArg). Result type
  // inferred: AbstractDataType is private[sql] in Spark 4.
  override def inputTypes = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    H60Hash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.H60Hash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H60Hash =
    copy(child = newChild)
}

object H60Hash {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (15 hex digits), big-endian, as a long. */
  def hash(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    (v << 4) | ((dig(7) & 0xF0L) >> 4)
  }
}
