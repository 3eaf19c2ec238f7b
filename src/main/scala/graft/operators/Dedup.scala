package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/**
 * Deduplication operators for a training-data pipeline, each built as a
 * shuffle-conscious composition of built-ins:
 *
 *  - exact:          one hash-aggregate on the dedup key
 *  - MinHash + LSH:  shingle → minhash signature → band → bucket-join —
 *                    candidate pairs come from an inverted index on band
 *                    hashes, never an all-pairs product
 *  - SimHash:        64-bit signature + hamming verify on banded candidates
 *  - n-gram Jaccard: exact, via an inverted shingle index join
 *  - embedding near-dup: cosine over LSH buckets
 *
 * All pair generators emit (id_a < id_b) canonical pairs and are safe to
 * scale: the only shuffles are keyed by band/bucket/shingle hash, and
 * frequent (stop-)shingles can be dropped before the join (df cap).
 */
object Dedup {

  /** Exact dedup: keep min(id) per key; adds n_dups for observability. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /**
   * MinHash signature: `numHashes` permutations approximated by
   * (a·h + b) mod p over 32-bit shingle hashes (h widened to long first —
   * products stay < 2^62, no ANSI overflow). Returns array<long>.
   */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int): Column = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val shingleHashes = transform(T.charShingles(text, shingleN),
      s => pmod(hash(s), lit(p.toInt)).cast("long"))
    val sig = (0 until numHashes).map { i =>
      val a = 1L + 2 * ((1103515245L * i + 12345) % 1073741823L) // odd, < 2^31
      val b = (1103515245L * (i + 7919) + 12345) % p
      val perm = transform(shingleHashes, h => (h * a + b) % p)
      when(size(perm) === 0, lit(p)).otherwise(array_min(perm))
    }
    array(sig: _*)
  }

  /**
   * MinHash+LSH candidate pairs: signature sliced into `bands` bands of
   * `numHashes/bands` rows; docs sharing any band hash become candidates;
   * candidates are verified by estimated Jaccard = matching minhashes /
   * numHashes ≥ `threshold`.
   */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigd = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes, shingleN).as("sig"))
    // inverted index: (band, hash-of-band-slice) → ids
    val banded = sigd.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
          .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)) / numHashes.toDouble).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(round(max("est_jaccard"), 4).as("est_jaccard"))
  }

  /**
   * 64-bit SimHash from token hashes: per bit, majority vote of token
   * hash bits; assembled with shift/or (bitwise — overflow-free).
   */
  def simhash(text: Column): Column = {
    val th = transform(T.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(th, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /**
   * SimHash near-dup pairs: candidates share one of 4 16-bit chunks
   * (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verified by
   * `bit_count(xor) <= maxHamming`.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigd = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = sigd.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sig"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "key")))
    val l = chunked.select(col("chunk"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /**
   * Exact n-gram Jaccard over an inverted shingle index: explode distinct
   * shingles, self-join on shingle (the only shuffle, keyed by shingle
   * hash), count shared, Jaccard = shared / (|A| + |B| - shared).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        array_distinct(T.shingles(col(textCol), n)).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val l = sh.select(col("s"), col("id").as("id_a"), col("n_sh").as("na"))
    val r = sh.select(col("s"), col("id").as("id_b"), col("n_sh").as("nb"))
    l.join(r, "s").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"), first("na").as("na"), first("nb").as("nb"))
      .select(col("id_a"), col("id_b"),
        round(col("shared") / (col("na") + col("nb") - col("shared")).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Embedding near-dup: cosine ≥ threshold pairs, candidate-limited to
   * shared LSH buckets (multi-probe over `tables` independent tables so
   * recall survives unlucky hyperplanes).
   */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 2): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until tables).map(t =>
        V.lshBucket(col(vecCol), bits, seed = 58 + t)): _*)).as(Seq("tbl", "bucket")))
    val l = bucketed.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val r = bucketed.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), V.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(round(max("cos"), 4).as("cos"))
  }
}
