package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Analysis-time input gates for the kernels below. All are SQL-
  * registered ([[graft.functions.GraftFunctions.register]]), so a
  * wrong-typed SQL call must fail as a named AnalysisException during
  * analysis, not a ClassCastException from `dataType`/`eval` at
  * runtime. Spark 4's `TypeCollection`/`ExpectsInputTypes` sugar is
  * `private[sql]` for mixed float/double acceptance, so these are
  * plain `checkInputDataTypes` implementations. */
private[expressions] object KernelTypeCheck {
  def ok: TypeCheckResult = TypeCheckResult.TypeCheckSuccess

  def fail(fn: String, pos: String, want: String, got: DataType): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$fn: $pos must be $want, got ${got.catalogString}")

  def numericArray(fn: String, pos: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => ok
      case other => fail(fn, pos, "array<float> or array<double>", other)
    }

  def arrayOf(fn: String, pos: String, e: Expression, elem: DataType,
      want: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(t, _) if t == elem => ok
      case other => fail(fn, pos, want, other)
    }
}

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

  // accepts array<float> / array<double> on either side
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelTypeCheck.numericArray("graft_dot", "argument 1", left)
    if (l.isFailure) l
    else KernelTypeCheck.numericArray("graft_dot", "argument 2", right)
  }

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

  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.numericArray("graft_unit_vec", "argument 1", child)

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
 *
 * FINITE-INPUT CONTRACT (like the null-element one): the bit-identical
 * claim holds for finite dot products only. A NaN dot (NaN element, or
 * `+Inf · -Inf` etc.) never displaces the incumbent here (`NaN >= x`
 * is false), while Spark's struct ordering in the `array_max` form
 * treats NaN as the GREATEST value — so a vector with non-finite
 * elements could be assigned a different list depending on which form
 * ran. Every caller in this engine feeds unit-normalized finite
 * embeddings (the quantizers reject/never produce non-finite
 * centroids), so the divergence is unreachable in-engine; SQL callers
 * own the contract.
 */
case class ArgmaxDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelTypeCheck.numericArray("graft_argmax_dot", "argument 1", left)
    if (l.isFailure) l
    else right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => KernelTypeCheck.ok
      case other => KernelTypeCheck.fail("graft_argmax_dot", "argument 2",
        "array<array<double>> (the centroid matrix)", other)
    }
  }

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

/**
 * Deterministic sorted-fold kernel behind the corpus-LM text scores
 * (q69/q92 char entropy, q77 unigram surprisal, q84 bigram surprisal).
 * Input is the per-doc `sort_array(collect_list(struct(...)))` column
 * those queries build; output is `struct<n: bigint, s: double>` — the
 * count fold and the weighted-log fold in ONE array pass.
 *
 * Same fold as the two HOF `aggregate` lambdas it replaces — same
 * ascending element order (the array is pre-sorted), same per-term
 * shape `acc + cnt_d * f(log2 …)` — but with `log2(x) =
 * StrictMath.log(x) / StrictMath.log(2)`, which is STRONGER than the
 * HOF's determinism: `Math.log` (what the interpreted `Log2` calls)
 * is JIT-intrinsifiable and may differ by 1 ulp between a JVM's
 * interpreter and compiled code — the property sweep caught exactly
 * that flip — while `StrictMath.log` is fdlibm-exact in every
 * compilation state. So this node is ≤1 ulp from the HOF fold on any
 * input and EXACTLY reproducible run to run (the sorted-fold
 * determinism contract, now ulp-tight; the 4-dp round at the query
 * surface absorbed the HOF's instability, and keeps absorbing the
 * ≤1-ulp HOF delta here). The HOF form was also a CodegenFallback
 * evaluated per element with boxing; per-doc distinct n-gram arrays
 * made that the dominant cost of the whole query at sf1 (q84: 4.1×
 * sf0.1→sf1, the suite's worst curvature). This node is a plain Java
 * loop inside whole-stage codegen.
 *
 * Modes (element struct layouts are the queries' own, counts never
 * null or ≤ 0 — group-by keys with `count(*)` values):
 *  - `entropy`  (ch, cnt):            s += cnt · log2(cnt)
 *  - `unigram`  (tok, cnt, gcnt):     s += cnt · (log2(scalar) − log2(gcnt))
 *  - `bigram`   (prev, cur, cnt, cab, ca):
 *                                     s += cnt · (log2(ca + scalar) − log2(cab + 1))
 */
case class SurprisalFold(arr: Expression, scalar: Expression, mode: String)
    extends BinaryExpression {

  require(SurprisalFold.CntOrdinal.contains(mode),
    s"graft_surprisal_fold: unknown mode '$mode' " +
      s"(expected one of ${SurprisalFold.CntOrdinal.keys.mkString(", ")})")

  override def left: Expression = arr
  override def right: Expression = scalar

  override def checkInputDataTypes(): TypeCheckResult = {
    val fn = "graft_surprisal_fold"
    // the struct ordinals each mode's fold reads as long (doc table)
    val longOrds = mode match {
      case "entropy" => Seq(1); case "unigram" => Seq(1, 2)
      case "bigram" => Seq(2, 3, 4)
    }
    arr.dataType match {
      case ArrayType(st: StructType, _) if st.size > longOrds.max &&
          longOrds.forall(o => st(o).dataType == LongType) =>
        if (scalar.dataType == DoubleType) KernelTypeCheck.ok
        else KernelTypeCheck.fail(fn, "argument 2", "double", scalar.dataType)
      case other => KernelTypeCheck.fail(fn, "argument 1",
        s"array<struct> with bigint fields at ordinals " +
          s"${longOrds.mkString(",")} (mode '$mode')", other)
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false)))

  private def numFields: Int = arr.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].size

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val sc = b.asInstanceOf[Double]
    val nf = numFields
    val ln2 = java.lang.StrictMath.log(2.0)
    val m = x.numElements()
    var n = 0L
    var s = 0.0
    var i = 0
    mode match {
      case "entropy" =>
        while (i < m) {
          val c = x.getStruct(i, nf).getLong(1)
          n += c
          s += c.toDouble * (java.lang.StrictMath.log(c.toDouble) / ln2)
          i += 1
        }
      case "unigram" =>
        val lt = java.lang.StrictMath.log(sc) / ln2
        while (i < m) {
          val r = x.getStruct(i, nf)
          val c = r.getLong(1)
          n += c
          s += c.toDouble * (lt - java.lang.StrictMath.log(r.getLong(2).toDouble) / ln2)
          i += 1
        }
      case "bigram" =>
        while (i < m) {
          val r = x.getStruct(i, nf)
          val c = r.getLong(2)
          n += c
          s += c.toDouble * (java.lang.StrictMath.log(r.getLong(4).toDouble + sc) / ln2
            - java.lang.StrictMath.log(r.getLong(3).toDouble + 1.0) / ln2)
          i += 1
        }
    }
    org.apache.spark.sql.catalyst.InternalRow(n, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nf = numFields
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val ln2 = ctx.freshName("ln2")
      val lt = ctx.freshName("lt")
      val rowT = "org.apache.spark.sql.catalyst.InternalRow"
      val (pre, term) = mode match {
        case "entropy" => ("",
          s"""long $c = $r.getLong(1);
             |  $n += $c;
             |  $s += ((double) $c)
             |    * (java.lang.StrictMath.log((double) $c) / $ln2);""".stripMargin)
        case "unigram" => (s"double $lt = java.lang.StrictMath.log($b) / $ln2;",
          s"""long $c = $r.getLong(1);
             |  $n += $c;
             |  $s += ((double) $c)
             |    * ($lt - java.lang.StrictMath.log((double) $r.getLong(2)) / $ln2);""".stripMargin)
        case "bigram" => ("",
          s"""long $c = $r.getLong(2);
             |  $n += $c;
             |  $s += ((double) $c)
             |    * (java.lang.StrictMath.log((double) $r.getLong(4) + $b) / $ln2
             |      - java.lang.StrictMath.log((double) $r.getLong(3) + 1.0) / $ln2);""".stripMargin)
      }
      s"""
         |int $m = $a.numElements();
         |double $ln2 = java.lang.StrictMath.log(2.0);
         |$pre
         |long $n = 0L;
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $rowT $r = $a.getStruct($i, $nf);
         |  $term
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$n, $s});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(arr = newLeft, scalar = newRight)
}

object SurprisalFold {
  /** mode → ordinal of the count field (doc: layout table above). */
  val CntOrdinal: Map[String, Int] =
    Map("entropy" -> 1, "unigram" -> 1, "bigram" -> 2)
}

/**
 * Word n-gram shingles from a token array — the native kernel behind
 * [[graft.functions.TextFunctions.shinglesFromTokens]]. Bit-identical
 * to the HOF form it replaces
 * (`transform(sequence(0, size-n), i => concat_ws(" ", slice(ts, i+1, n)))`,
 * empty for size < n): same [[UTF8String.concatWs]] the `ConcatWs`
 * expression evaluates, same element order. The HOF is a
 * CodegenFallback that re-enters the interpreter once PER SHINGLE with
 * a fresh `slice` allocation each time; shingling runs over every doc
 * in a dozen corpus queries, which made it the engine's single widest
 * interpreted hot spot. Here: one method call per ROW, a tight loop
 * inside, reachable from whole-stage codegen via a reference object.
 */
/**
 * Per-element `xxhash64` of a string array in ONE codegen-reachable
 * node — bit-identical to `transform(arr, s -> xxhash64(s))` (seed 42,
 * null element → seed, matching Spark's `XxHash64Function`;
 * property-pinned in FunctionsSpec) without the HOF's per-ELEMENT
 * interpreter re-entry. Exists for the dedup family's hashed shingle
 * SETS: the exact-Jaccard verification join ships these 8-byte images
 * instead of ~40-byte shingle strings, and the corpus-wide injectivity
 * certificate the df build already carries transfers |A∩B| exactness
 * from the strings to the hashes.
 */
case class HashLongs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf("graft_hash_longs", "argument 1", child,
      StringType, "array<string>")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val seed = 42L

  def compute(a: ArrayData): GenericArrayData = {
    val m = a.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = if (a.isNullAt(i)) seed
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(a.getUTF8String(i), seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashLongs", this, classOf[HashLongs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"graft_word_shingles: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf("graft_word_shingles", "argument 1", child,
      StringType, "array<string> (token array)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(ts: ArrayData): GenericArrayData = {
    val m = ts.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) { buf(j) = ts.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Character n-gram shingles from a (normalized) string — the native
 * kernel behind [[graft.functions.TextFunctions.charShinglesFromNorm]].
 * Bit-identical to the HOF form
 * (`transform(sequence(0, length-n), i => substring(norm, 1+i, n))`,
 * empty for length < n): CODEPOINT-addressed like `Substring`/
 * `UTF8String.substringSQL` (never tears astral-plane surrogate
 * pairs — the spec's astral case pins this), but computed with ONE
 * byte-offset walk per row instead of substringSQL's per-shingle
 * from-the-start rescan — O(len) rather than O(len²) — and without the
 * per-element interpreter re-entry of the CodegenFallback HOF.
 */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"graft_char_shingles: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) KernelTypeCheck.ok
    else KernelTypeCheck.fail("graft_char_shingles", "argument 1",
      "string", child.dataType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // byte offset of each codepoint start (+ end sentinel)
    var numChars = 0
    var off = 0
    val offs = new Array[Int](nb + 1)
    while (off < nb) {
      offs(numChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      numChars += 1
    }
    offs(numChars) = nb
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](numChars - n + 1)
    var i = 0
    while (i + n <= numChars) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Shannon entropy (bits/char, UNROUNDED) of a character-array column —
 * the native kernel behind
 * [[graft.functions.TextFunctions.charEntropyFromChars]]. Same fold as
 * the builtin composition it replaces
 * (`aggregate(transform(array_sort(array_distinct(cs)), c =>
 * size(filter(cs, _ === c))), 0.0, acc + cnt·log2 cnt)` then
 * `log2(n) − s/n`): same ascending binary-order fold over the distinct
 * characters (a TreeMap over UTF8String keys iterates exactly
 * `array_sort`'s order), same final subtraction; empty input → 0.0,
 * null → null. `log2` via StrictMath — exactly reproducible in every
 * JVM compilation state, ≤1 ulp from the `Math.log`-based HOF (see
 * [[SurprisalFold]]'s determinism note). The builtin form
 * re-scanned the whole array INTERPRETED once per distinct character —
 * O(distinct × len) lambda evaluations per row; this is one counting
 * pass + one distinct-sized fold.
 */
case class CharDistEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeCheck.arrayOf("graft_char_entropy", "argument 1", child,
      StringType, "array<string> (character array)")

  override def dataType: DataType = DoubleType

  def compute(a: ArrayData): Double = {
    val n = a.numElements()
    if (n <= 0) return 0.0
    val counts = new java.util.TreeMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val c = a.getUTF8String(i)
      val prev = counts.get(c)
      counts.put(c, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val ln2 = java.lang.StrictMath.log(2.0)
    var s = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next().toDouble
      s += cnt * (java.lang.StrictMath.log(cnt) / ln2)
    }
    java.lang.StrictMath.log(n.toDouble) / ln2 - s / n
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharDistEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two long arrays agree — the MinHash
  * signature-agreement kernel (est. Jaccard = matches / numHashes). */
case class LongArrayMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelTypeCheck.arrayOf("graft_match_count", "argument 1",
      left, LongType, "array<bigint> (signature)")
    if (l.isFailure) l
    else KernelTypeCheck.arrayOf("graft_match_count", "argument 2",
      right, LongType, "array<bigint> (signature)")
  }

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
