package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicates an sf0.1 directory k times
  * with key remapping so the result is a VALID larger instance of the same
  * schema, not k exact copies of the same rows.
  *
  * Design goals (this fixture exists to measure scale CURVATURE — sec vs
  * rows — of the heavy operator families, so the scale-up must not distort
  * the per-row work profile):
  *
  *  - **Join fan-out is preserved.** Every foreign key is remapped with the
  *    same stride as its referenced primary key (copy i of lineitem points
  *    at copy i of orders/part/supplier), so per-key join cardinalities are
  *    IDENTICAL to the source fixture — a join that was 1:4 at sf0.1 is
  *    still 1:4 at sf1, there are just 10x more keys.
  *  - **Near-dup pair density scales linearly.** Documents in copy i>0 get
  *    a per-copy BIJECTIVE character map (an AFFINE map x → a·x + b over a
  *    case-distinct prime-sized 61-char wheel — never the identity; any
  *    two distinct copies' maps agree on at most ONE wheel character).
  *    A bijection preserves every intra-copy shingle relationship
  *    exactly (token- AND char-level), while cross-copy shared shingles
  *    are limited to punctuation/whitespace/fixed-'9' grams plus at most
  *    one agreeing character — far below any working threshold. The true
  *    near-dup pair count at factor k is exactly k times the source
  *    count — if a pairs-finding query grows super-linearly at sf1,
  *    that is the ALGORITHM's curvature, not an artifact of the fixture
  *    quadratically inflating the answer.
  *  - **Embedding geometry scales linearly.** Copy i>0 vectors get an
  *    ORTHOGONAL per-copy transform: rotation by 1+(i-1)%(dim-1)
  *    positions (always non-zero) composed with a sign-flip pattern
  *    (i-1)/(dim-1) — norm- and intra-copy-inner-product-preserving, so
  *    cross-copy cosine is incidental (~random) and ANN/SemDeDup
  *    cluster structure replicates per copy instead of collapsing into
  *    one dense ball.
  *  - **Factor bound.** Both per-copy transform families are finite:
  *    the affine text maps number P·(P−1) = 3660 over the prime
  *    61-char wheel (r14 — was 61 plain shifts) and the embedding
  *    rotation×sign-flip family (dim−1)·2¹⁶ (was dim−1 rotations).
  *    [[scale]] REQUIRES k inside both bounds — past them two distinct
  *    copies would get byte-identical documents/embeddings, silently
  *    reinjecting exactly the cross-copy duplicate pairs the fixture
  *    promises not to create.
  *  - **Stream density is preserved.** Events keep their timestamps but get
  *    fresh user_ids per copy, so per-user/per-minute densities (and thus
  *    sessionization and window costs per key) match the source.
  *
  * region/nation are TPC-H-style fixed dimensions and are copied verbatim.
  * Copy 0 is the source data unchanged. Everything is a pure column
  * expression over a replicate-factor explode — no UDFs, no driver loops —
  * so generating sf1 (6M lineitem) takes seconds on local[32].
  *
  * Usage: runMain graft.tools.ScaleFixture <srcDir> <dstDir> <factor>
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, k)
    spark.stop()
  }

  /** Cross-join each row with copy ids 0..k-1. The tiny copies frame is the
    * broadcast side; the fan-out happens executor-side, one output row per
    * (row, copy). */
  private def replicate(df: DataFrame, k: Int): DataFrame = {
    val copies = df.sparkSession.range(0, k).toDF("__copy")
    df.crossJoin(broadcast(copies))
  }

  /** Stride for a key column: the smallest power of ten > max(key), so
    * remapped keys are disjoint per copy and stay human-readable. Strides
    * are derived from the SOURCE fixture only — deterministic given src. */
  private def stride(df: DataFrame, col: String): Long = {
    val mx = df.agg(max(col)).head.getLong(0)
    var s = 1L
    while (s <= mx) s *= 10
    s
  }

  /** One case-distinct PRIME-SIZED character wheel (61 chars — '9' is
    * deliberately left OUT, so it stays fixed in every copy): the
    * per-copy text transform is an AFFINE map x → a·x + b over the
    * wheel positions (r14 — the plain Caesar shift family capped the
    * factor at 61 copies; the affine family over a prime wheel has
    * 61·60 = 3660 members, and any two DISTINCT members agree on at
    * most ONE wheel character — Δa ≠ 0 has exactly one fixed point
    * mod a prime, Δa = 0 has none — so cross-copy shared shingles are
    * limited to grams built from punctuation/whitespace, the fixed
    * '9', and at most one agreeing character: far below any working
    * threshold, the same caveat class as before). Case-distinct
    * because a fold would not be injective (case-variant docs could
    * collapse, inflating intra-copy pair counts). */
  private val wheel = "abcdefghijklmnopqrstuvwxyz" +
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ012345678"
  private val P = wheel.length // 61, prime

  /** Copy i's affine map as a `translate` target string: position x of
    * the wheel maps to wheel((a·x + b) mod P). idx = i enumerates
    * (a, b) pairs b-major with the identity (a=1, b=0) skipped —
    * copies 1..60 are the pure shifts b = 1..60 (the old family),
    * later copies walk the multiplier classes. */
  private[graft] def affineTarget(i: Int): String = {
    val idx = i // i >= 1; idx 0 would be the identity
    val a = 1 + (idx / P) % (P - 1)
    val b = idx % P
    (0 until P).map(x => wheel((a * x + b) % P)).mkString
  }

  def scale(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    require(k >= 1, s"factor must be >= 1, got $k")
    // transform-distinctness bounds, checked BEFORE any write: k past
    // either bound would hand two copies the SAME transform, i.e.
    // byte-identical cross-copy documents/embeddings — exactly the
    // duplicate injection this fixture promises not to make, silently.
    // r14: the affine text family (P·(P−1) members) and the
    // rotation×sign-flip embedding family ((dim−1)·2¹⁶) raised both
    // bounds far past any factor this repo will run.
    require(k <= P * (P - 1),
      s"factor $k exceeds the ${P * (P - 1) - 1} distinct affine text " +
        "maps (+ identity copy 0) this fixture can generate without " +
        "cross-copy duplicates — scale from a bigger source")
    val embDim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding")).as("d")).head.getInt(0)
    require(k <= (embDim - 1) * 65536,
      s"factor $k exceeds the ${(embDim - 1) * 65536 - 1} distinct " +
        s"rotation×sign-flip embedding transforms at dim=$embDim")

    def rd(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
    def remap(c: String, s: Long) = (col(c) + col("__copy") * s).as(c)

    // fixed dimensions: verbatim
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    val customer = rd("customer")
    val supplier = rd("supplier")
    val part = rd("part")
    val orders = rd("orders")
    val lineitem = rd("lineitem")
    val events = rd("events")
    val documents = rd("documents")
    val embeddings = rd("embeddings")

    val ckS = stride(customer, "c_custkey")
    val skS = stride(supplier, "s_suppkey")
    val pkS = stride(part, "p_partkey")
    val okS = stride(orders, "o_orderkey")
    val uidS = stride(events, "user_id")
    val eidS = stride(events, "event_id")
    val didS = stride(documents, "doc_id")
    val vidS = stride(embeddings, "vec_id")

    wr(replicate(customer, k).select(
      remap("c_custkey", ckS), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer", math.max(1, k / 2))

    wr(replicate(supplier, k).select(
      remap("s_suppkey", skS), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier", 1)

    wr(replicate(part, k).select(
      remap("p_partkey", pkS), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")),
      "part", math.max(1, k / 2))

    wr(replicate(orders, k).select(
      remap("o_orderkey", okS), remap("o_custkey", ckS),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", k)

    wr(replicate(lineitem, k).select(
      remap("l_orderkey", okS), remap("l_partkey", pkS),
      remap("l_suppkey", skS), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem", 2 * k)

    // events: fresh ids per copy, same timestamps -> per-user and
    // per-minute densities match the source; total stream is k x wider.
    wr(replicate(events, k).select(
      remap("event_id", eidS), col("ts"), remap("user_id", uidS),
      col("event_type"), col("value"), col("props")), "events", k)

    // documents: copy 0 verbatim; copy i>0 applies a per-copy BIJECTIVE
    // character rotation (a Caesar shift of [a-z0-9], case folded into
    // the same wheel). A bijection preserves every intra-copy shingle
    // relationship EXACTLY — token boundaries, lengths, repetition
    // structure, and Jaccard between any two docs are invariant — so
    // the true near-dup pair count at factor k is exactly k times the
    // source count, for BOTH token-level and char-n-gram shingles.
    // (The earlier token-suffix salt got this wrong for char shingles:
    // 'hello~1' vs 'hello~2' still share their interior 5-grams, so
    // cross-copy similarity was materially above zero for long tokens
    // and the fixture itself could inject super-linear pair growth.)
    // Cross-copy, every letter/digit maps to a different character, so
    // shared shingles are limited to all-punctuation/whitespace grams —
    // far below any working threshold. n_chars is exactly preserved.
    // upper and lower case are DISTINCT wheel positions (a case fold
    // would not be injective — two case-variant docs could collapse
    // into one, inflating intra-copy pair counts)
    val rotated = (1 until k).foldLeft(
        when(col("__copy") === 0, col("text"))) { (acc, i) =>
      acc.when(col("__copy") === i,
        translate(col("text"), wheel, affineTarget(i)))
    }
    wr(replicate(documents, k)
      .withColumn("text", rotated)
      .select(remap("doc_id", didS), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars")),
      "documents", k)

    // embeddings: copy i applies rotation r = 1 + (i-1) % (dim-1)
    // (always NON-ZERO — a bare `i % dim` degenerates at multiples of
    // dim into byte-identical copies, cosine 1.0 cross-copy) composed
    // with a per-copy SIGN-FLIP pattern f = (i-1) / (dim-1) (r14 —
    // extends the family past dim-1 copies: coordinate d negates iff
    // bit (d mod 16) of f is set; two copies sharing a rotation differ
    // in some flip bit, so they differ on every coordinate class
    // d ≡ β (mod 16) — identical vectors would need zeros across a
    // whole class, which dense float embeddings never have). Both
    // halves are ORTHOGONAL maps, so |v|, intra-copy inner products,
    // and hence every cluster/ANN relationship replicate exactly;
    // cross-copy cosine stays incidental.
    val dim = size(col("embedding"))
    val mCopy = col("__copy") - 1
    val shift = mCopy % (dim - 1) + 1
    val fpat = floor(mCopy / (dim - 1)).cast("double")
    val rot = concat(
      slice(col("embedding"), shift + 1, dim),
      slice(col("embedding"), lit(1), shift))
    val rotFlipped = zip_with(rot, sequence(lit(0), dim - 1),
      (x, d) => when(
        pmod(floor(fpat / pow(lit(2.0), pmod(d, lit(16)).cast("double")))
          .cast("long"), lit(2L)) === 1L, -x).otherwise(x))
    wr(replicate(embeddings, k)
      .withColumn("embedding",
        when(col("__copy") === 0, col("embedding")).otherwise(rotFlipped))
      .select(remap("vec_id", vidS), col("embedding"), col("label")),
      "embeddings", math.max(1, k / 2))

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$dst/$t.parquet").count())
    println("SCALED " + counts.map { case (t, n) => s"$t=$n" }.mkString(" "))
  }
}
