package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew tooling: salted equi-join for hot keys.
 *
 * AQE's skew-join handles most cases at runtime; salting is the
 * explicit fallback when one join key dominates (the classic 100 TB
 * failure: one key's partition OOMs a task). The skewed (large) side
 * gets a deterministic salt in [0, salt); the small side is replicated
 * `salt` times; the join key becomes (key, salt), spreading the hot key
 * over `salt` tasks.
 */
object Skew {

  /**
   * Inner equi-join `large ⋈ small` on `key`, with the large side
   * salted. Deterministic: the salt derives from a hash of the large
   * side's full row, so reruns produce identical assignments.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    // salt = 0 would make pmod(x, 0) NULL on every large row and the
    // join silently EMPTY (null keys never match); negative salts
    // would mismatch the two sides' salt domains the same silent way
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(!large.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "inputs already carry a __salt column")
    val l = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salt)).cast("int"))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
