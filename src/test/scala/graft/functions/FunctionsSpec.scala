package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T, VectorFunctions => V}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / tokenCount: empty-safe") {
    val df = Seq("hello big world", "  ", "", "one").toDF("text")
    val counts = df.select(T.tokenCount($"text")).as[Int].collect().toSeq
    assert(counts === Seq(3, 0, 0, 1))
  }

  test("shingles: word n-grams") {
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(T.shingles($"text", 2)).as[Seq[String]].head()
    assert(sh === Seq("a b", "b c", "c d"))
    val short = Seq("a").toDF("text")
      .select(T.shingles($"text", 2)).as[Seq[String]].head()
    assert(short === Seq.empty)
  }

  test("charShingles normalizes whitespace and case") {
    val sh = Seq("Ab  cD").toDF("text")
      .select(T.charShingles($"text", 3)).as[Seq[String]].head()
    assert(sh === Seq("ab ", "b c", " cd"))
  }

  test("langId picks the dominant stopword language") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist nicht da",
      "xyzzy qwerty").toDF("text")
    assert(df.select(T.langId($"text")).as[String].collect().toSeq ===
      Seq("en", "de", "und"))
  }

  test("quality metrics") {
    val df = Seq("Ab1 cd!").toDF("text")
    val r = df.select(T.digitRatio($"text").as("d"), T.upperRatio($"text").as("u"),
      T.meanTokenLen($"text").as("m"), T.punctCount($"text").as("p")).head()
    assert(r.getAs[Double]("d") === 0.1429) // 1 digit / len 7, rounded to 4
    assert(r.getAs[Double]("u") === 0.1429)
    assert(r.getAs[Double]("m") === 3.0)
    assert(r.getAs[Int]("p") === 1)
  }

  test("charEntropy: uniform chars = log2(k); constant = 0; empty = 0") {
    val df = Seq("abcd", "aaaa", "").toDF("text")
    val r = df.select(T.charEntropy($"text")).as[Double].collect().toSeq
    assert(r === Seq(2.0, 0.0, 0.0)) // 4 distinct uniform → log2(4)=2
  }

  test("stopwordRatio counts English function words per token") {
    val df = Seq("the cat and the dog", "xyzzy qwerty").toDF("text")
    assert(df.select(T.stopwordRatio($"text")).as[Double].collect().toSeq ===
      Seq(0.6, 0.0)) // 3 stopword hits / 5 tokens; 0 / 2
  }

  test("dot/norm kernels match the HOF reference implementation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      V.dot($"a", $"b").as("d"), V.dotHof($"a", $"b").as("dh"),
      V.norm($"a").as("n")).head()
    assert(r.getAs[Double]("d") === 32.0)
    assert(r.getAs[Double]("dh") === 32.0)
    assert(math.abs(r.getAs[Double]("n") - math.sqrt(14)) < 1e-12)
  }

  test("unitVec kernel ≡ the HOF normalization, bit for bit; zero and empty vectors pass through") {
    // float input, double input, zero vector, empty vector
    val f = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array.empty[Float])).toDF("id", "v")
    val got = f.select($"id", V.unitVec($"v").as("u"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) === Seq(0.6, 0.8))
    assert(got(2L) === Seq(0.0, 0.0)) // zero norm: cast copy, no NaN
    assert(got(3L) === Seq.empty)
    // bit-identity with the builtin composition on arbitrary values —
    // the ANN family's correctness claim rests on this
    val d = Seq((1L, Seq(0.1, -2.7, 3.14159, 0.0, 1e-9))).toDF("id", "v")
    val both = d.select(
      V.unitVec($"v").as("k"),
      V.normalized($"v", V.norm($"v")).as("h")).head()
    assert(both.getSeq[Double](0) === both.getSeq[Double](1))
  }

  test("argmaxDot kernel ≡ array_max over (dot, lid) structs, including the larger-index tie") {
    val mat = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Array(0.9f, 0.1f)), // row 0 wins
      (2L, Array(0.1f, 0.9f)), // rows 1 and 2 TIE → larger index (2)
      (3L, Array(-1.0f, -1.0f))).toDF("id", "v") // ALL tie → largest (2)
    val got = df.select($"id",
        GraftFunctions.graftArgmaxDot($"v", typedlit(mat)).as("lid"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 2, 3L -> 2))
    // reference: the literal-struct argmax form used at small nlist
    val ref = df.select($"id",
        array_max(array(mat.zipWithIndex.map { case (cv, i) =>
          struct(V.dot($"v", typedlit(cv)).as("d"), lit(i).as("lid"))
        }: _*)).getField("lid").as("lid"))
      .as[(Long, Int)].collect().toMap
    assert(ref === got)
    // SQL surface
    spark.sql("SELECT graft_argmax_dot(array(0.1D, 0.9D), " +
        "array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS lid")
      .as[Int].collect().toSeq match {
      case Seq(lid) => assert(lid === 1)
    }
  }

  test("cosine: identical=1, orthogonal=0, zero-vector=0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val cs = df.select(V.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(cs(1) === 0.0 && cs(2) === 0.0)
  }

  test("graftMatchCount counts agreeing positions") {
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 8L))).toDF("a", "b")
    assert(df.select(GraftFunctions.graftMatchCount($"a", $"b")).as[Int].head() === 2)
  }

  test("kernels are callable from SQL text") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "graft_match_count(array(1L, 2L), array(1L, 9L)) AS m").head()
    assert(r.getAs[Double]("d") === 11.0)
    assert(r.getAs[Int]("m") === 1)
  }

  test("wrong arity fails analysis with WRONG_NUM_ARGS, never IndexOutOfBounds") {
    // one arg short
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0D))").collect()
    }
    assert(e1.getMessage.contains("graft_dot"))
    // one arg extra (was silently ignored)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_h60('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("graft_h60"))
  }

  test("hashLongs kernel ≡ transform(arr, s => xxhash64(s)), incl. empty and unicode") {
    val rows = Seq(
      Seq("a", "bb", "ccc"), Seq.empty[String],
      Seq("", " ", "é世😀"),
      (0 until 64).map(i => s"shingle $i text"),
      Seq("dup", "dup", "x")).toDF("arr")
    val both = rows.select(
        GraftFunctions.graftHashLongs($"arr").as("k"),
        transform($"arr", s => xxhash64(s)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (k, hof) => assert(k === hof) }
    // SQL registration + type gate
    assert(spark.sql("SELECT graft_hash_longs(array('a','b')) AS h")
      .head().getSeq[Long](0).length === 2)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hash_longs(array(1, 2))").collect()
    }
    assert(e.getMessage.contains("graft_hash_longs"))
  }

  test("wrong input TYPES fail analysis as named errors, never ClassCastException") {
    def bad(sql: String, fn: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains(fn), s"$fn: got ${e.getMessage}")
    }
    bad("SELECT graft_unit_vec('abc')", "graft_unit_vec")
    bad("SELECT graft_dot(array('a'), array(1.0D))", "graft_dot")
    bad("SELECT graft_argmax_dot(array(1.0D), array(1.0D))", "graft_argmax_dot")
    bad("SELECT graft_match_count(array('x'), array('y'))", "graft_match_count")
    bad("SELECT graft_word_shingles('not an array', 2)", "graft_word_shingles")
    bad("SELECT graft_char_shingles(array('a'), 2)", "graft_char_shingles")
    bad("SELECT graft_char_entropy('abc')", "graft_char_entropy")
    bad("SELECT graft_surprisal_fold(array(named_struct('c', 'x', 'n', 1)), 2.0D, 'entropy')",
      "graft_surprisal_fold")
    // well-typed calls still pass analysis + run
    assert(spark.sql("SELECT graft_unit_vec(array(3.0D, 4.0D)) AS v")
      .head().getSeq[Double](0) === Seq(0.6, 0.8))
    assert(spark.sql("SELECT graft_match_count(array(1L, 2L), array(1L, 3L)) AS m")
      .head().getInt(0) === 1)
  }

  test("GraftExtensions installs into a SparkSessionExtensions instance") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw; functional
    // behavior is covered by the register()-based tests above
  }

  test("graft_minhash_sig aggregate agrees with the Column-API minhash") {
    import graft.operators.Dedup
    val sh = Seq("hello world foo bar baz qux example text")
      .toDF("text")
      .select(Dedup.shingleHashes($"text", 5).as("sh"))
    val viaColumn = sh.select(Dedup.minhashFromHashes($"sh", 16))
      .as[Seq[Long]].head()
    val viaAgg = sh.select(explode($"sh").as("h"))
      .agg(GraftFunctions.graftMinhashSig($"h", 16))
      .as[Seq[Long]].head()
    assert(viaColumn === viaAgg)
  }

  test("graft_simhash_sig aggregate agrees with the Column-API simhash") {
    import graft.operators.Dedup
    val df = Seq("the quick brown fox jumps over lazy dogs").toDF("text")
    val viaColumn = df.select(Dedup.simhash($"text")).as[Long].head()
    val viaAgg = df.select(explode(Dedup.tokenHashes($"text")).as("h"))
      .agg(GraftFunctions.graftSimhashSig($"h")).as[Long].head()
    assert(viaColumn === viaAgg)
  }

  test("fingerprint: near-identical docs share min-shingle fingerprints") {
    val df = Seq("a b c d e f g", "a b c d e f g", "totally different words here")
      .toDF("text")
    val fps = df.select(T.fingerprint($"text", 3)).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("astral-plane text (non-BMP codepoints) is handled whole, never torn at surrogates") {
    // 𝕏 U+1D54F, 😀 U+1F600, 𠀀 U+20000 — all surrogate PAIRS in the
    // JVM's UTF-16. Spark's UTF8String operates on codepoints, so
    // length/split("")/substring must count and slice whole characters;
    // a code-unit implementation would tear pairs and double-count.
    val xs = "𝕏" // 𝕏
    val emo = "😀" // 😀
    val cjkB = "𠀀" // 𠀀
    val df = Seq(
      (1L, xs * 4), // 4 identical astral chars
      (2L, s"$emo a $emo b"), // astral mixed with ASCII tokens
      (3L, s"$xs$emo$cjkB") // 3 distinct astral chars
    ).toDF("id", "text")
    val m = df.select($"id", length($"text").as("len"),
        T.charEntropy($"text").as("ent"),
        T.meanTokenLen($"text").as("mtl"),
        T.subwordCount($"text").as("nsub"))
      .as[(Long, Int, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // codepoint counting: 4 astral chars are length 4, not 8
    assert(m(1L)._2 === 4 && m(1L)._4 === 4.0)
    // entropy over the character DISTRIBUTION: 4 identical chars = 0,
    // 3 distinct = log2(3); code-unit splitting would see the shared
    // high surrogate U+D835/U+D83D/U+D840 as repeat "characters"
    assert(m(1L)._3 === 0.0)
    assert(m(3L)._3 === 1.585)
    // each astral char is ONE subword-regex hit ([^A-Za-z0-9\s])
    assert(m(1L)._5 === 4 && m(3L)._5 === 3)
    // char shingles keep pairs intact: every shingle is 2 CODEPOINTS
    val sh = df.filter($"id" === 3L)
      .select(T.charShingles($"text", 2)).as[Seq[String]].head()
    assert(sh === Seq(xs + emo, emo + cjkB))
    assert(sh.forall(s => s.codePointCount(0, s.length) === 2))
    // fingerprints on astral-only text: deterministic and distinct
    val fps = df.select(T.fingerprint($"text", 1)).as[Long].collect()
    assert(fps.distinct.length === 3)
  }

  test("surprisalFold kernel ≡ the HOF folds (counts exact, log sums ≤1 ulp), all three modes; empty array = (0, 0.0)") {
    // the log sum compares within 1 ulp, NOT exactly: the HOF's Log2
    // calls Math.log, whose JIT intrinsic may differ from its
    // interpreted result by 1 ulp — the kernel uses StrictMath (stable
    // in every compilation state), so the HOF is the ulp-wobbly side
    // here. KernelProperties pins the kernel EXACTLY against a
    // driver-side StrictMath reference.
    def check(df: org.apache.spark.sql.DataFrame): Unit =
      df.select($"f.n".as("kn"), $"f.s".as("ks"), $"hn", $"hs")
        .as[(Long, Double, Long, Double)].collect().foreach {
          case (kn, ks, hn, hs) =>
            assert(kn === hn)
            assert(math.abs(ks - hs) <= math.ulp(hs), s"$ks vs $hs")
        }
    val docs = Seq((1L, "hello world hello"), (2L, "aa ab aa ba aa"),
      (3L, "x")).toDF("doc_id", "text")
    // entropy: (doc, char) counts — q69/q92's exact cc shape
    val ecc = docs.select($"doc_id", explode(split($"text", "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"ch", $"cnt"))).as("cc"))
    check(ecc.select(
      GraftFunctions.graftSurprisalFold($"cc", lit(0.0), "entropy").as("f"),
      aggregate($"cc", lit(0L), (a, x) => a + x.getField("cnt")).as("hn"),
      aggregate($"cc", lit(0.0), (a, x) => a + x.getField("cnt").cast("double")
        * log2(x.getField("cnt").cast("double"))).as("hs")))
    // unigram: (doc, tok) vs corpus counts — q77's cc shape
    val toks = docs.select($"doc_id", explode(T.tokens($"text")).as("tok"))
    val total = toks.count().toDouble
    val ucc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .join(toks.groupBy("tok").agg(count(lit(1)).as("gcnt")), "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"tok", $"cnt", $"gcnt"))).as("cc"))
    check(ucc.select(
      GraftFunctions.graftSurprisalFold($"cc", lit(total), "unigram").as("f"),
      aggregate($"cc", lit(0L), (a, x) => a + x.getField("cnt")).as("hn"),
      aggregate($"cc", lit(0.0), (a, x) => a + x.getField("cnt").cast("double")
        * (log2(lit(total)) - log2(x.getField("gcnt").cast("double")))).as("hs")))
    // bigram: q84's cc shape, scalar (vocab) as a COLUMN
    val bg = toks.groupBy("doc_id")
      .agg(collect_list($"tok").as("ts"))
      .select($"doc_id", explode(T.shinglesFromTokens($"ts", 2)).as("b"))
      .select($"doc_id", substring_index($"b", " ", 1).as("prev"),
        substring_index($"b", " ", -1).as("cur"))
    val dcnt = bg.groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("cnt"))
    val cab = dcnt.groupBy("prev", "cur").agg(sum("cnt").as("cab"))
    val vocab = toks.agg(countDistinct($"tok").cast("double").as("vocab"))
    val bcc = dcnt.join(cab, Seq("prev", "cur"))
      .join(cab.groupBy("prev").agg(sum("cab").as("ca")), Seq("prev"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"prev", $"cur", $"cnt", $"cab", $"ca")))
        .as("cc"))
      .crossJoin(broadcast(vocab))
    check(bcc.select(
      GraftFunctions.graftSurprisalFold($"cc", $"vocab", "bigram").as("f"),
      aggregate($"cc", lit(0L), (a, x) => a + x.getField("cnt")).as("hn"),
      aggregate($"cc", lit(0.0), (a, x) => a + x.getField("cnt").cast("double")
        * (log2(x.getField("ca").cast("double") + $"vocab")
          - log2(x.getField("cab").cast("double") + 1.0))).as("hs")))
    // empty array folds to the inits, like the HOFs
    val z = ecc.limit(1)
      .select(GraftFunctions.graftSurprisalFold(
        slice($"cc", 1, 0), lit(0.0), "entropy").as("f"))
      .select($"f.n", $"f.s").as[(Long, Double)].head()
    assert(z === ((0L, 0.0)))
    // SQL surface + the named analysis error for a bad mode
    val viaSql = spark.sql("SELECT graft_surprisal_fold(" +
      "array(named_struct('ch', 'a', 'cnt', 4L)), 0.0D, 'entropy') AS f")
      .select($"f.s").as[Double].head()
    assert(viaSql === 8.0) // 4 * log2(4)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_surprisal_fold(array(named_struct('ch', 'a', " +
        "'cnt', 1L)), 0.0D, 'nope')").collect()
    }
    assert(e.getMessage.contains("graft_surprisal_fold"))
  }

  test("shingle kernels ≡ the HOF forms element for element; tokens ≡ the filter form") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "  leading  and   trailing  ", "one two", "x", "", "\t\n ",
      "a b c d e f g h i j k l m n o p", "ünïcödé tëxt wïth Ünïcödé",
      "𝓐 😀  0 mixed astral 𝓐😀")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // tokens: array_remove form ≡ the filter-HOF form
    val tokBoth = df.select(T.tokens($"text").as("k"),
        filter(split(trim($"text"), "\\s+"), t => length(t) > 0).as("h"))
      .as[(Seq[String], Seq[String])].collect()
    tokBoth.foreach { case (k, h) => assert(k === h) }
    // word shingles for several n, incl. n > token count
    for (n <- Seq(1, 2, 5, 20)) {
      val both = df.select($"id", T.tokens($"text").as("ts"))
        .select(T.shinglesFromTokens($"ts", n).as("k"),
          when(size($"ts") < n, array().cast("array<string>")).otherwise(
            transform(sequence(lit(0), size($"ts") - n),
              i => concat_ws(" ", slice($"ts", i + 1, lit(n))))).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (k, h) => assert(k === h, s"n=$n") }
    }
    // char shingles: codepoint-addressed ≡ the substring-HOF form
    for (n <- Seq(1, 3, 7)) {
      val both = df.select(T.normText($"text").as("nt"))
        .select(T.charShinglesFromNorm($"nt", n).as("k"),
          when(length($"nt") < n, array().cast("array<string>")).otherwise(
            transform(sequence(lit(0), length($"nt") - n),
              i => substring($"nt", lit(1) + i, lit(n)).cast("string"))).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (k, h) => assert(k === h, s"n=$n") }
    }
    // SQL surface
    val viaShSql = spark.sql(
      "SELECT graft_word_shingles(array('a','b','c'), 2) AS s")
      .as[Seq[String]].head()
    assert(viaShSql === Seq("a b", "b c"))
    // char-entropy kernel ≡ the sorted HOF fold it replaced
    val entBoth = df.select(
        T.charEntropyFromChars(split($"text", "")).as("k"),
        {
          val cs = split($"text", "")
          val n = size(cs)
          val s = aggregate(
            transform(array_sort(array_distinct(cs)),
              c => size(filter(cs, x => x === c)).cast("double")),
            lit(0.0), (acc, cnt) => acc + cnt * log2(cnt))
          when(n <= 0, lit(0.0))
            .otherwise(round(log2(n.cast("double")) - s / n, 4)).as("h")
        })
      .as[(Double, Double)].collect()
    entBoth.foreach { case (k, h) => assert(k === h) }
  }
}
