package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-deterministic hashing for the verification path.
 *
 * The near-dup / ANN operators are hash-driven (shingle hashes, LSH
 * bucket keys, centroid picks). Their default production hash is Spark's
 * codegen'd `hash()`/`xxhash64` — fast, but engine-specific, which is why
 * round 1 could only give those queries a rows-only driver check. This
 * object provides a *portable* 60-bit hash built from `md5`, which every
 * engine computes identically over UTF-8 bytes: the driver's DuckDB
 * oracle mirrors `('0x' || substr(md5(x),1,15))::BIGINT` bit-for-bit
 * (parity verified for ASCII + multi-byte UTF-8 inputs), so the whole
 * MinHash/SimHash/LSH pipeline becomes hash-verifiable end to end.
 *
 * 15 hex chars = 60 bits — always nonnegative, fits a signed 64-bit long
 * in both engines, and leaves headroom so `(h * a + b)` permutation
 * arithmetic stays below 2^63 (no ANSI overflow on either side).
 *
 * Production guidance: md5 costs ~3× murmur per call; the operators keep
 * the fast hash as their default and take `portable = true` only where a
 * cross-engine replay matters (the declared verification queries do).
 */
object PortableHash {

  /** 2^31 − 1, the Mersenne prime the MinHash permutations work mod. */
  val P: Long = 2147483647L

  /** Portable 60-bit hash of a string column (first 15 hex chars of
    * md5) — the native [[graft.functions.expressions.H60Hash]] kernel;
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`
    * (H60Properties) at ~3× less cost per call. */
  def h60(c: Column): Column = GraftFunctions.graftH60(c.cast("string"))

  /** [[h60]] reduced mod P — the portable shingle-hash for MinHash. */
  def hmodP(c: Column): Column = h60(c) % P

  /** DuckDB mirror of [[h60]] for oracle-SQL generation. */
  def sqlH60(e: String): String = s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** DuckDB mirror of [[hmodP]]. */
  def sqlHmodP(e: String): String = s"(${sqlH60(e)} % $P)"

  /** The salted-key encoding every portable id-hash draw shares
    * ([[graft.operators.DatasetSplit]] folds, [[graft.operators.Mixing]]
    * admissions): the bare id when the salt is empty (pre-salt hashes
    * stay stable), else `len(id):id:salt` — the length prefix pins the
    * id/salt boundary so an id containing ':' can never alias a
    * different (id, salt) pair. Load-bearing for cross-engine parity:
    * change it ONLY together with [[sqlSaltedKey]]. */
  def saltedKey(id: Column, salt: String): Column = {
    val s = id.cast("string")
    if (salt.isEmpty) s
    else concat(length(s).cast("string"), lit(":"), s, lit(":" + salt))
  }

  /** DuckDB mirror of [[saltedKey]] for oracle-SQL generation. */
  def sqlSaltedKey(idExpr: String, salt: String): String =
    if (salt.isEmpty) s"CAST($idExpr AS VARCHAR)"
    else s"(CAST(len(CAST($idExpr AS VARCHAR)) AS VARCHAR) || ':' || " +
      s"CAST($idExpr AS VARCHAR) || ':$salt')"

  /** Plan-time Scala evaluation of [[h60]] — used to derive literals
    * (LSH hyperplanes) embedded identically in the Spark plan and the
    * oracle SQL, so neither engine needs to hash at run time. */
  def h60s(s: String): Long =
    // delegates to the runtime expression's own extraction: a drifted
    // reimplementation here would desynchronize plan-time LSH
    // hyperplane literals from the runtime hash (and this reuses its
    // thread-local MessageDigest)
    expressions.H60Hash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /**
   * Deterministic pseudo-random hyperplanes for sign-bit LSH: component
   * (b, i) = md5-derived uniform in [−0.5, 0.5). Derived once at plan
   * time from (seed, bit, dim-index) and embedded as literals — both in
   * the Spark plan (`typedlit`) and the generated oracle SQL, so bucket
   * assignment is the *same arithmetic on the same constants* in both
   * engines (the only cross-engine divergence left is the fp dot-product
   * accumulation, which can flip a sign only when |proj| ≲ 1e−13).
   */
  def planes(seed: Int, bits: Int, dim: Int): Seq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dim).map { i =>
        (h60s(s"$seed:$b:$i") % 1000003L).toDouble / 1000003.0 - 0.5
      }
    }

  /** SQL literal for a double that round-trips exactly: Java's shortest
    * repr parses back to the identical double in DuckDB. */
  def sqlDouble(d: Double): String = java.lang.Double.toString(d)

  /** SQL literal for a plane: `[w0, w1, ...]`. */
  def sqlPlane(w: Seq[Double]): String =
    w.map(sqlDouble).mkString("[", ", ", "]")
}
