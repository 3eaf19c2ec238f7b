package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.expressions.{ArgmaxDot, BloomProbeAny, CharDistEntropy, CharShingles, DotProduct, FreqItemsAgg, H60Hash, HashLongs, LongArrayMatchCount, MinHashSigAgg, SimHashSigAgg, SurprisalFold, UnitVector, WordShingles}

/**
 * Registration of the engine's native Catalyst expressions as SQL
 * functions, and Column-API wrappers over them.
 *
 * `register(spark)` is idempotent and must run once per session (the
 * engine entry points — Verify/Bench/tests — all call it). The wrappers
 * resolve lazily via `call_function`, so Columns can be built before a
 * session exists.
 */
object GraftFunctions {

  val DotName     = "graft_dot"
  val ArgmaxDotName = "graft_argmax_dot"
  val UnitVecName = "graft_unit_vec"
  val MatchName   = "graft_match_count"
  val MinHashName = "graft_minhash_sig"
  val SimHashName = "graft_simhash_sig"
  val BloomAggName   = "graft_bloom_agg"
  val MightContainName = "graft_might_contain"
  val BloomProbeAnyName = "graft_bloom_probe_any"
  val FreqItemsName = "graft_freq_items"
  val SurprisalFoldName = "graft_surprisal_fold"
  val WordShinglesName = "graft_word_shingles"
  val CharShinglesName = "graft_char_shingles"
  val CharEntropyName = "graft_char_entropy"
  val HashLongsName = "graft_hash_longs"
  val H60Name = "graft_h60"
  val SnapshotName = "graft_snapshot"
  val RollupName = "graft_rollup"
  val CardName = "graft_card"
  val ConstraintsName = "graft_constraints"

  /** Arity gate for the scalar/aggregate builders: the same up-front
    * WRONG_NUM_ARGS discipline the TVF builders follow — without it a
    * wrong SQL arg count threw a raw IndexOutOfBoundsException from
    * `exprs(1)`, and EXTRA args were silently ignored. */
  private[graft] def arity[A](name: String, exprs: Seq[Expression], n: Int)(
      build: => A): A = {
    if (exprs.size != n)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> exprs.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    build
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(DotName,
      exprs => arity(DotName, exprs, 2)(DotProduct(exprs(0), exprs(1))),
      "built-in")
    reg.createOrReplaceTempFunction(ArgmaxDotName,
      exprs => arity(ArgmaxDotName, exprs, 2)(
        ArgmaxDot(exprs(0), exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(UnitVecName,
      exprs => arity(UnitVecName, exprs, 1)(UnitVector(exprs(0))),
      "built-in")
    reg.createOrReplaceTempFunction(MatchName,
      exprs => arity(MatchName, exprs, 2)(
        LongArrayMatchCount(exprs(0), exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(MinHashName,
      exprs => arity(MinHashName, exprs, 2)(MinHashSigAgg(exprs(0),
        graft.GraftExtensions.foldableIntArgExact(MinHashName, exprs, 1))
        .toAggregateExpression()), "built-in")
    reg.createOrReplaceTempFunction(SimHashName,
      exprs => arity(SimHashName, exprs, 1)(
        SimHashSigAgg(exprs(0)).toAggregateExpression()), "built-in")
    // Spark's internal runtime-filter expressions, surfaced for the
    // explicit BloomJoin operator (and SQL users via GraftExtensions).
    // Number (not Int): SQL callers naturally write INT literals.
    reg.createOrReplaceTempFunction(BloomAggName,
      exprs => arity(BloomAggName, exprs, 2)(
        new BloomFilterAggregate(exprs(0),
          graft.GraftExtensions.foldableIntArg(BloomAggName, exprs, 1).longValue)
          .toAggregateExpression()), "built-in")
    reg.createOrReplaceTempFunction(MightContainName,
      exprs => arity(MightContainName, exprs, 2)(
        BloomFilterMightContain(exprs(0), exprs(1))), "built-in")
    // bloom-PER-ROW probe (might_contain demands a constant bloom) —
    // the BloomIndex stats-table pruning predicate
    reg.createOrReplaceTempFunction(BloomProbeAnyName,
      exprs => arity(BloomProbeAnyName, exprs, 2)(
        BloomProbeAny(exprs(0), exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(FreqItemsName,
      exprs => arity(FreqItemsName, exprs, 2)(FreqItemsAgg(exprs(0),
        graft.GraftExtensions.foldableIntArgExact(FreqItemsName, exprs, 1))
        .toAggregateExpression()), "built-in")
    reg.createOrReplaceTempFunction(SurprisalFoldName,
      exprs => arity(SurprisalFoldName, exprs, 3)({
        val mode = graft.GraftExtensions.foldableStringArg(SurprisalFoldName, exprs, 2)
        // gate BEFORE construction: the case-class require is an
        // internal contract, SQL callers get a named analysis error
        if (!SurprisalFold.CntOrdinal.contains(mode))
          throw new org.apache.spark.sql.AnalysisException(
            "INVALID_PARAMETER_VALUE.STRING", Map(
              "parameter" -> "argument 3", "functionName" -> SurprisalFoldName,
              "invalidValue" -> s"'$mode'"))
        SurprisalFold(exprs(0), exprs(1), mode)
      }), "built-in")
    reg.createOrReplaceTempFunction(WordShinglesName,
      exprs => arity(WordShinglesName, exprs, 2)(WordShingles(exprs(0),
        graft.GraftExtensions.foldableIntArgExact(WordShinglesName, exprs, 1))),
      "built-in")
    reg.createOrReplaceTempFunction(CharShinglesName,
      exprs => arity(CharShinglesName, exprs, 2)(CharShingles(exprs(0),
        graft.GraftExtensions.foldableIntArgExact(CharShinglesName, exprs, 1))),
      "built-in")
    reg.createOrReplaceTempFunction(CharEntropyName,
      exprs => arity(CharEntropyName, exprs, 1)(CharDistEntropy(exprs(0))),
      "built-in")
    reg.createOrReplaceTempFunction(HashLongsName,
      exprs => arity(HashLongsName, exprs, 1)(HashLongs(exprs(0))),
      "built-in")
    reg.createOrReplaceTempFunction(H60Name,
      exprs => arity(H60Name, exprs, 1)(H60Hash(exprs(0))), "built-in")
    // table-valued: snapshot reads (incl. time travel) for SQL users —
    // SELECT * FROM graft_snapshot('/path/to/snap'[, version])
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      SnapshotName, snapshotPlanBuilder, "built-in")
    // the ops surface for SQL-only sessions: serving views of standing
    // rollup/card stores, and the data-contract report over any parquet
    // path — SELECT * FROM graft_rollup('/store'),
    // graft_card('/store'), graft_constraints('/tbl.parquet', '<spec>')
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      RollupName, rollupPlanBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      CardName, cardPlanBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      ConstraintsName, constraintsPlanBuilder, "built-in")
  }

  /** Builder behind the `graft_snapshot(dir[, version])` table function
    * (shared by [[register]] and the session-extension path): resolves
    * a [[graft.operators.Merge]] snapshot — through the manifest
    * pointer when one exists, at a specific retained commit when
    * `version` is given — and expands to its already-analyzed read
    * plan, the same way the programmatic
    * [[graft.operators.Merge.readSnapshotAt]] surface does. */
  private[graft] def snapshotPlanBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.AnalysisException
    if (exprs.isEmpty || exprs.size > 2)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> SnapshotName, "expectedNum" -> "1 or 2",
        "actualNum" -> exprs.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val dir = graft.GraftExtensions.foldableStringArg(SnapshotName, exprs, 0)
    val spark = SparkSession.active
    val df =
      if (exprs.size == 2)
        graft.operators.Merge.readSnapshotAt(spark, dir,
          graft.GraftExtensions.foldableIntArg(SnapshotName, exprs, 1).longValue)
      else graft.operators.Merge.readSnapshot(spark, dir)
    df.queryExecution.analyzed
  }

  /** `graft_rollup(dir)`: the finalized serving view of a standing
    * [[graft.operators.Rollup]] store, for SQL-only sessions. The
    * store's persisted spec sidecar (written by every init/fold since
    * round 7) supplies the measure list and histogram bin edges the
    * state schema alone cannot encode; a pre-sidecar store fails
    * analysis with a message saying one fold will self-heal it. */
  private[graft] def rollupPlanBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val (dir, spark, spec) = storeArgs(RollupName, exprs)
    graft.operators.Rollup.finalized(
      graft.operators.Rollup.read(spark, dir), spec)
      .queryExecution.analyzed
  }

  /** `graft_card(dir)`: the one-row data card of a standing
    * [[graft.operators.DataCard]] store — same resolution path as
    * [[rollupPlanBuilder]], plus the card's null-count renames. */
  private[graft] def cardPlanBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.AnalysisException
    val (dir, spark, spec) = storeArgs(CardName, exprs)
    val card = graft.operators.DataCard.fromRollupSpec(spec).getOrElse(
      throw new AnalysisException("INVALID_PARAMETER_VALUE.PATTERN", Map(
        "parameter" -> "dir", "functionName" -> CardName,
        "value" -> (s"'$dir' (a rollup store, not a data-card store — " +
          s"read it with $RollupName)"))))
    graft.operators.DataCard.read(spark, dir, card)
      .queryExecution.analyzed
  }

  /** Shared tail of the store TVFs: path arg + persisted-spec lookup. */
  private def storeArgs(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : (String, SparkSession, graft.operators.Rollup.Spec) = {
    import org.apache.spark.sql.AnalysisException
    if (exprs.size != 1)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> fn, "expectedNum" -> "1",
        "actualNum" -> exprs.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val dir = graft.GraftExtensions.foldableStringArg(fn, exprs, 0)
    val spark = SparkSession.active
    val spec = graft.operators.Rollup.readSpec(spark, dir).getOrElse(
      throw new AnalysisException("INVALID_PARAMETER_VALUE.PATTERN", Map(
        "parameter" -> "dir", "functionName" -> fn,
        "value" -> (s"'$dir' (no readable _graft_spec.json sidecar — a " +
          "store written before spec persistence; one programmatic " +
          "fold rewrites it)"))))
    (dir, spark, spec)
  }

  /** `graft_constraints(path, spec)`: the data-contract report over a
    * parquet path for SQL-only sessions — one row per check, same
    * shape as [[graft.operators.Constraints.report]]. `spec` is a
    * compact check list, `;`-separated:
    *
    *  - `not_null:col`
    *  - `range:col:lo:hi` (NULL passes; numeric bounds)
    *  - `set:col:v1|v2|v3` (NULL passes)
    *  - `pred:name:<sql boolean expr>` (NULL = violation; the expr is
    *    everything after the second `:`, so it may itself contain `:`)
    *  - `unique:c1,c2`
    *  - `ref:col:dimPath:dimCol` (every non-null col value must appear
    *    in the parquet table at dimPath's dimCol)
    *
    * The report is a bounded driver-side aggregate (one row per check),
    * so materializing it at analysis time — like `graft_snapshot`
    * resolving its manifest — keeps the TVF a plain LocalRelation. */
  private[graft] def constraintsPlanBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.AnalysisException
    import graft.operators.Constraints
    if (exprs.size != 2)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> ConstraintsName, "expectedNum" -> "2",
        "actualNum" -> exprs.size.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val path = graft.GraftExtensions.foldableStringArg(ConstraintsName, exprs, 0)
    val specStr = graft.GraftExtensions.foldableStringArg(ConstraintsName, exprs, 1)
    val spark = SparkSession.active
    def bad(item: String, why: String): Nothing =
      throw new AnalysisException("INVALID_PARAMETER_VALUE.PATTERN", Map(
        "parameter" -> "spec", "functionName" -> ConstraintsName,
        "value" -> s"'$item' ($why)"))
    val checks = specStr.split(";").map(_.trim).filter(_.nonEmpty).toSeq
      .map { item =>
        item.split(":", 2).toSeq match {
          case Seq("not_null", c) => Constraints.NotNull(c)
          case Seq("range", rest) => rest.split(":") match {
            case Array(c, lo, hi) =>
              try Constraints.InRange(c, lo.toDouble, hi.toDouble)
              catch { case _: NumberFormatException =>
                bad(item, "non-numeric bound") }
            case _ => bad(item, "expected range:col:lo:hi")
          }
          // split bounded at 2: values may themselves contain ':'
          case Seq("set", rest) => rest.split(":", 2) match {
            case Array(c, vs) if vs.nonEmpty =>
              Constraints.InSet(c, vs.split("\\|").toSeq)
            case _ => bad(item, "expected set:col:v1|v2")
          }
          case Seq("pred", rest) => rest.split(":", 2) match {
            case Array(n, sql) if sql.nonEmpty =>
              Constraints.Predicate(n,
                org.apache.spark.sql.functions.expr(sql))
            case _ => bad(item, "expected pred:name:<sql>")
          }
          case Seq("unique", cs) =>
            Constraints.Unique(cs.split(",").map(_.trim).toSeq)
          // dimPath may carry a URI scheme (s3a://…): col is the FIRST
          // ':'-token, dimCol the LAST — the path is everything between
          case Seq("ref", rest) =>
            val firstC = rest.indexOf(':')
            val lastC = rest.lastIndexOf(':')
            if (firstC < 0 || lastC <= firstC + 1 ||
                firstC == 0 || lastC == rest.length - 1)
              bad(item, "expected ref:col:dimPath:dimCol")
            val (c, dimPath, dimCol) = (rest.substring(0, firstC),
              rest.substring(firstC + 1, lastC), rest.substring(lastC + 1))
            Constraints.Ref(c, spark.read.parquet(dimPath), dimCol)
          case _ => bad(item, "unknown check kind")
        }
      }
    if (checks.isEmpty) bad(specStr, "empty spec")
    Constraints.report(spark, spark.read.parquet(path), checks)
      .queryExecution.analyzed
  }

  /** Codegen'd dot product (double) of two float/double arrays. */
  def graftDot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Codegen'd argmax-by-dot-product: index of the matrix row (an
    * array<array<double>>, typically a centroid literal) with the
    * largest dot against `vec`; ties → largest index. */
  def graftArgmaxDot(vec: Column, mat: Column): Column =
    call_function(ArgmaxDotName, vec, mat)

  /** Codegen'd L2 unit-normalization of a float/double array (double
    * out; zero-norm passes through). See
    * [[expressions.UnitVector]] for why this must not be a HOF. */
  def graftUnitVec(vec: Column): Column = call_function(UnitVecName, vec)

  /** Codegen'd count of agreeing positions in two long arrays. */
  def graftMatchCount(a: Column, b: Column): Column = call_function(MatchName, a, b)

  /** Codegen'd sorted-fold for the corpus-LM text scores: one array
    * pass over the per-doc `sort_array(collect_list(struct(...)))`
    * column → `struct<n: bigint, s: double>`, bit-identical to the two
    * HOF `aggregate` folds it replaces (see
    * [[expressions.SurprisalFold]] for modes and layouts). */
  def graftSurprisalFold(cc: Column, scalar: Column, mode: String): Column =
    call_function(SurprisalFoldName, cc, scalar.cast("double"),
      org.apache.spark.sql.functions.lit(mode))

  /** Codegen'd word n-gram shingles over a token array (see
    * [[expressions.WordShingles]] — bit-identical to the HOF form). */
  def graftWordShingles(ts: Column, n: Int): Column =
    call_function(WordShinglesName, ts, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd codepoint n-gram shingles over a string (see
    * [[expressions.CharShingles]] — bit-identical to the HOF form). */
  def graftCharShingles(s: Column, n: Int): Column =
    call_function(CharShinglesName, s, org.apache.spark.sql.functions.lit(n))

  /** Per-element xxhash64 of a string array in one codegen'd node —
    * bit-identical to `transform(arr, s => xxhash64(s))` without the
    * HOF's per-element interpreter re-entry (see
    * [[graft.functions.expressions.HashLongs]]). */
  def graftHashLongs(arr: Column): Column =
    call_function(HashLongsName, arr)

  /** Codegen'd character-distribution Shannon entropy (unrounded; see
    * [[expressions.CharDistEntropy]] — bit-identical to the sorted
    * HOF fold). */
  def graftCharEntropy(cs: Column): Column =
    call_function(CharEntropyName, cs)

  /** MinHash signature aggregate over a long-hash column (one buffer,
    * tight-loop update; see MinHashSigAgg). */
  def graftMinhashSig(h: Column, numHashes: Int): Column =
    call_function(MinHashName, h, org.apache.spark.sql.functions.lit(numHashes))

  /** 64-bit SimHash signature aggregate over a token-hash column. */
  def graftSimhashSig(h: Column): Column = call_function(SimHashName, h)

  /** Misra-Gries frequent-items summary aggregate (see FreqItemsAgg). */
  def graftFreqItems(item: Column, k: Int): Column =
    call_function(FreqItemsName, item, org.apache.spark.sql.functions.lit(k))

  /** Native portable 60-bit md5 hash (see [[expressions.H60Hash]]). */
  def graftH60(s: Column): Column = call_function(H60Name, s)

  /** Bloom filter (binary) aggregate over a long-hash column. */
  def graftBloomAgg(h: Column, expectedItems: Long): Column =
    call_function(BloomAggName, h, org.apache.spark.sql.functions.lit(expectedItems))

  /** Membership probe of a long hash against a bloom binary. */
  def graftMightContain(bloom: Column, h: Column): Column =
    call_function(MightContainName, bloom, h)

  /** Per-row bloom probe: does the row's bloom binary possibly contain
    * ANY of the long hashes? (see [[expressions.BloomProbeAny]]) */
  def graftBloomProbeAny(bloom: Column, hashes: Column): Column =
    call_function(BloomProbeAnyName, bloom, hashes)
}
