package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** Property sweep for the round-9 text kernels.
  *
  * String kernels (shingles) must equal the builtin-HOF compositions
  * they replaced EXACTLY on arbitrary unicode — string ops have no
  * float wobble, so any divergence is a real bug.
  *
  * Log-fold kernels (surprisal fold, char entropy) are pinned EXACTLY
  * against independent driver-side StrictMath references instead: the
  * HOF forms call `Math.log`, whose JIT intrinsic may legally differ
  * from its interpreted result by 1 ulp (this sweep originally caught
  * such a flip mid-run), so the HOFs are not a stable oracle at the
  * last bit. The kernels use StrictMath — reproducible in every JVM
  * compilation state — and these properties prove they compute the
  * documented fold, not merely something close to it. */
object KernelProperties extends Properties("textKernels") {

  private lazy val spark = SparkSpec.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val textGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("√", "é", "中", "🙂", "𝓐", "a", "bb", " ", "\t", "\n"))
      .map(_.mkString(" ")),
    Gen.listOf(Gen.oneOf("x", "😀", "", "  ")).map(_.mkString),
    Gen.const(""))

  property("word shingles kernel == transform/slice/concat_ws HOF, n in 1..5") =
    Prop.forAll(Gen.listOfN(12, textGen), Gen.choose(1, 5)) { (texts, n) =>
      import spark.implicits._
      val rows = texts.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("ts"))
        .select(
          GraftFunctions.graftWordShingles(col("ts"), n).as("k"),
          when(size(col("ts")) < n, array().cast("array<string>")).otherwise(
            transform(sequence(lit(0), size(col("ts")) - n),
              i => concat_ws(" ", slice(col("ts"), i + 1, lit(n))))).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      rows.forall { case (k, h) => k == h }
    }

  property("char shingles kernel == substring HOF (codepoint-addressed), n in 1..4") =
    Prop.forAll(Gen.listOfN(12, textGen), Gen.choose(1, 4)) { (texts, n) =>
      import spark.implicits._
      val rows = texts.toDF("text")
        .select(TextFunctions.normText(col("text")).as("nt"))
        .select(
          GraftFunctions.graftCharShingles(col("nt"), n).as("k"),
          when(length(col("nt")) < n, array().cast("array<string>")).otherwise(
            transform(sequence(lit(0), length(col("nt")) - n),
              i => substring(col("nt"), lit(1) + i, lit(n)).cast("string"))).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      rows.forall { case (k, h) => k == h }
    }

  /** Driver-side reference: entropy over codepoints of `text`, the
    * documented fold (sorted distinct, StrictMath log2), UNROUNDED. */
  private def refEntropy(text: String): Double = {
    // mirror split(text, ""): one element per codepoint (Spark splits
    // an empty pattern per character, surrogate pairs kept whole)
    val cps = text.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val n = cps.length
    if (n <= 0) return 0.0
    val ln2 = java.lang.StrictMath.log(2.0)
    // sorted by UTF8 binary order = Java String compareTo? NO — UTF8
    // binary order differs from UTF-16 order above the BMP, so sort by
    // the UTF-8 byte sequence exactly as array_sort does.
    val counts = new java.util.TreeMap[String, Long](new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = {
        val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
        var i = 0
        while (i < x.length && i < y.length) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    })
    cps.foreach(c => counts.merge(c, 1L, (p, q) => p + q))
    var s = 0.0
    counts.values().forEach { cnt =>
      s += cnt.toDouble * (java.lang.StrictMath.log(cnt.toDouble) / ln2)
    }
    java.lang.StrictMath.log(n.toDouble) / ln2 - s / n
  }

  property("char entropy kernel == driver-side StrictMath reference, exactly") =
    Prop.forAll(Gen.listOfN(12, textGen)) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(GraftFunctions.graftCharEntropy(split(col("text"), "")))
        .as[Double].collect().toSeq
      val want = texts.map(refEntropy)
      got == want
    }

  private val countRow: Gen[(Long, Long, Long)] = for {
    cnt <- Gen.choose(1L, 1000L)
    cab <- Gen.choose(1L, 1000L)
    ca  <- Gen.choose(1L, 100000L)
  } yield (cnt, cab, ca)

  /** Driver-side reference for the bigram fold over the SORTED rows. */
  private def refBigram(rows: Seq[(String, String, Long, Long, Long)],
      vocab: Double): (Long, Double) = {
    val ln2 = java.lang.StrictMath.log(2.0)
    var n = 0L
    var s = 0.0
    rows.sorted.foreach { case (_, _, cnt, cab, ca) =>
      n += cnt
      s += cnt.toDouble * (java.lang.StrictMath.log(ca.toDouble + vocab) / ln2
        - java.lang.StrictMath.log(cab.toDouble + 1.0) / ln2)
    }
    (n, s)
  }

  property("surprisal fold kernel == driver-side StrictMath reference (bigram), exactly") =
    Prop.forAll(Gen.listOfN(6, Gen.listOf(countRow)), Gen.choose(1.0, 1e6)) {
      (docs, vocab) =>
        import spark.implicits._
        // distinct (prev, cur) within a doc, like the real dcnt group-by
        val perDoc = docs.zipWithIndex.map { case (cc, id) =>
          id.toLong -> cc.zipWithIndex.map { case ((cnt, cab, ca), j) =>
            (s"p${j % 7}", s"c$j", math.max(1L, cnt),
              math.max(1L, cab), math.max(1L, ca))
          }
        }.filter(_._2.nonEmpty)
        val rows = perDoc.flatMap { case (id, cc) =>
          cc.map { case (p, c, cnt, cab, ca) => (id, p, c, cnt, cab, ca) }
        }
        rows.isEmpty || {
          val got = rows.toDF("doc_id", "prev", "cur", "cnt", "cab", "ca")
            .groupBy("doc_id")
            .agg(sort_array(collect_list(struct(col("prev"), col("cur"),
              col("cnt"), col("cab"), col("ca")))).as("cc"))
            .select(col("doc_id"),
              GraftFunctions.graftSurprisalFold(col("cc"), lit(vocab), "bigram")
                .as("f"))
            .select(col("doc_id"), col("f.n"), col("f.s"))
            .as[(Long, Long, Double)].collect()
            .map(r => r._1 -> ((r._2, r._3))).toMap
          val want = perDoc.toMap.map { case (id, cc) => id -> refBigram(cc, vocab) }
          got == want
        }
    }
}
