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
  *    a per-copy BIJECTIVE character rotation (a Caesar shift over one
  *    case-distinct [a-zA-Z0-9] wheel, shift 1+(i-1)%(|wheel|-1) — never
  *    zero). A bijection preserves every intra-copy shingle relationship
  *    exactly (token- AND char-level), while cross-copy shared shingles
  *    are limited to punctuation/whitespace grams — far below any working
  *    threshold. The true near-dup pair count at factor k is exactly k
  *    times the source count — if a pairs-finding query grows
  *    super-linearly at sf1, that is the ALGORITHM's curvature, not an
  *    artifact of the fixture quadratically inflating the answer.
  *  - **Embedding geometry scales linearly.** Copy i>0 vectors are rotated
  *    left by 1+(i-1)%(dim-1) positions — always non-zero, norm-preserving
  *    — so cross-copy cosine is incidental (~random) and ANN/SemDeDup
  *    cluster structure replicates per copy instead of collapsing into one
  *    dense ball.
  *  - **Factor bound.** Both per-copy transform families are finite: the
  *    text shift cycles after |wheel|-1 = 61 distinct copies and the
  *    embedding rotation after dim-1. [[scale]] REQUIRES k inside both
  *    bounds — past them two distinct copies would get byte-identical
  *    documents/embeddings, silently reinjecting exactly the cross-copy
  *    duplicate pairs the fixture promises not to create.
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

  /** One case-distinct [a-zA-Z0-9] wheel: the per-copy text transform is
    * a Caesar shift over it. Case-distinct because a fold would not be
    * injective (case-variant docs could collapse, inflating intra-copy
    * pair counts). */
  private val wheel = "abcdefghijklmnopqrstuvwxyz" +
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  def scale(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    require(k >= 1, s"factor must be >= 1, got $k")
    // transform-distinctness bounds, checked BEFORE any write: the text
    // shift s = 1+(i-1)%(|wheel|-1) repeats every |wheel|-1 copies and
    // the embedding rotation every dim-1 copies — k past either bound
    // would hand two copies the SAME transform, i.e. byte-identical
    // cross-copy documents/embeddings: exactly the duplicate injection
    // this fixture promises not to make, and silently.
    require(k <= wheel.length,
      s"factor $k exceeds the ${wheel.length - 1} distinct text rotations " +
        "(+ identity copy 0) this fixture can generate without cross-copy " +
        "duplicates — enlarge the wheel or scale from a bigger source")
    val embDim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding")).as("d")).head.getInt(0)
    require(k <= embDim,
      s"factor $k exceeds the ${embDim - 1} distinct embedding rotations " +
        s"(+ identity copy 0) available at dim=$embDim — two copies would " +
        "get identical vectors, collapsing cross-copy cosine to 1.0")

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
    def shifted(i: Int): String = {
      val s = 1 + (i - 1) % (wheel.length - 1) // non-zero shift always
      wheel.drop(s) ++ wheel.take(s)
    }
    val rotated = (1 until k).foldLeft(
        when(col("__copy") === 0, col("text"))) { (acc, i) =>
      acc.when(col("__copy") === i,
        translate(col("text"), wheel, shifted(i)))
    }
    wr(replicate(documents, k)
      .withColumn("text", rotated)
      .select(remap("doc_id", didS), col("text"), col("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars")),
      "documents", k)

    // embeddings: copy i rotated left by 1 + (i-1) % (dim-1) positions —
    // always a NON-ZERO rotation (a bare `i % dim` degenerates for
    // copies at multiples of dim: a zero-length second slice would emit
    // the copy byte-identical to copy 0, cosine 1.0 across copies —
    // exactly the cross-copy cluster collapse the fixture promises not
    // to inject). |v| is unchanged, so normalized-cosine paths behave
    // identically within a copy.
    val dim = size(col("embedding"))
    val shift = (col("__copy") - 1) % (dim - 1) + 1
    val rot = concat(
      slice(col("embedding"), shift + 1, dim),
      slice(col("embedding"), lit(1), shift))
    wr(replicate(embeddings, k)
      .withColumn("embedding",
        when(col("__copy") === 0, col("embedding")).otherwise(rot))
      .select(remap("vec_id", vidS), col("embedding"), col("label")),
      "embeddings", math.max(1, k / 2))

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$dst/$t.parquet").count())
    println("SCALED " + counts.map { case (t, n) => s"$t=$n" }.mkString(" "))
  }
}
