package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst kernels for the hot per-pair inner loops of the
 * similarity/dedup operators.
 *
 * Rationale: Spark's higher-order functions (`zip_with`/`aggregate`) are
 * evaluated interpreted, per element, with boxing — fine for one pass per
 * row, but the dedup verifiers run them per *candidate pair* (millions at
 * bench scale, billions at 100 TB). These expressions generate a plain
 * Java loop inside whole-stage codegen instead (preference order (b) of
 * the build brief: custom `Expression` before custom physical operator).
 */

/** Dot product of two numeric arrays (float or double elements),
  * accumulated in double. Null if either side is null. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // accepts array<float> / array<double> on either side; callers are the
  // engine's own operators (TypeCollection is private[sql] in Spark 4, so
  // no analysis-time input check here)
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Unit-normalized copy of a numeric array (L2), double elements; a
 * zero-norm vector passes through as a double cast — bit-identical to
 * the `when(nrm === 0, transform(cast)).otherwise(transform(_ / nrm))`
 * builtin composition (same ascending-order double accumulation, same
 * sqrt, same per-element divide), but CODEGEN'D. The builtin form's
 * `transform` is a CodegenFallback: every expression referencing the
 * normalized column re-ran the interpreted lambda chain per row when
 * common-subexpression elimination couldn't fuse them — measured 30×
 * on the PQ encode projection (assignment + m codes all reference the
 * vector; 32 interpreted re-normalizations per row). One native node
 * makes the column cheap at EVERY reference site. Null elements are
 * read as primitives (undefined for nulls), the [[DotProduct]]
 * contract — embedding arrays carry none.
 */
case class UnitVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    val f = elemIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = xi
      acc += xi * xi
      i += 1
    }
    val nrm = math.sqrt(acc)
    if (nrm != 0.0) {
      var j = 0
      while (j < n) { out(j) /= nrm; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.$get($i);
         |  $out[$i] = $v;
         |  $acc += $v * $v;
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |if ($nrm != 0.0) {
         |  for (int $j = 0; $j < $n; $j++) { $out[$j] /= $nrm; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Index of the matrix row with the largest dot product against `vec` —
 * the IVF list-assignment kernel for LARGE quantizers. The per-centroid
 * literal-expression form inlines one dot loop per centroid; past a few
 * dozen centroids that blows the JIT/Janino method budgets (interpreted
 * fallback), and the join-key null-filter pushdown then re-derives the
 * whole expression per row OUTSIDE whole-stage codegen — measured 25×
 * slowdown at nlist = 141. This kernel is ONE expression node over one
 * matrix literal: cheap to evaluate anywhere the optimizer clones it.
 *
 * Tie semantics match `array_max` over (dot, lid) structs exactly:
 * among equal dots the LARGEST index wins (`>=` on an ascending scan),
 * so results are bit-identical to the literal form — lids are
 * positional by construction in every quantizer this engine builds.
 */
case class ArgmaxDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val nl = m.numElements()
    var best = -1
    var bestD = Double.NegativeInfinity
    var j = 0
    while (j < nl) {
      val cv = m.getArray(j)
      val n = math.min(x.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xi * cv.getDouble(i)
        i += 1
      }
      if (best < 0 || acc >= bestD) { bestD = acc; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat(left)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nl = ctx.freshName("nl")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $nl = $b.numElements();
         |int $best = -1;
         |double $bestD = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $nl; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($j);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$get($i)) * $cv.getDouble($i);
         |  }
         |  if ($best < 0 || $acc >= $bestD) { $bestD = $acc; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two long arrays agree — the MinHash
  * signature-agreement kernel (est. Jaccard = matches / numHashes). */
case class LongArrayMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
