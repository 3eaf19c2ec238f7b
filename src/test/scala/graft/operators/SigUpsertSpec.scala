package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** UPSERT/replacement for the directory signature stores — the
  * mutable-id remedy the [[Dedup.mutatedRedeliveries]] audit points
  * at: content mutated under a reused id previously could only
  * re-enter history via a whole-store compaction. Pins the contract:
  * [[Dedup.reclaimSignatureTombstones]] removes exactly the given
  * tombstoned ids' rows (file-granular, double-anti-joined so a
  * crashed-and-rerun reclaim never duplicates innocent rows) and
  * re-opens the ids through the shared [[TombstoneLog]];
  * [[Dedup.upsertSignatures]] = delete → targeted reclaim → admit the
  * NEW content, after which the store signature IS the new text's
  * signature — the old content stops matching, the new content
  * matches as history; the wide-SimHash twin keeps `_wide_meta` and
  * its draw-family gate intact. */
class SigUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "completely unrelated text about spark catalyst optimizer internals"),
    (2L, "another fully distinct document mentioning parquet bucketing layouts"),
    (3L, "yet another independent sentence about stream checkpoints and state")
  ).toDF("doc_id", "text")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def pairs(dir: String, batch: org.apache.spark.sql.DataFrame) =
    Dedup.minhashLshIncremental(spark, batch, "doc_id", "text", dir,
        numHashes = 64, bands = 16, shingleN = 5, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("minhash dir store: upsert swaps which content matches as history; audit comes back clean; physical row stays single") {
    val dir = tmpDir("sigups")
    Dedup.buildSignatureStore(docs, "doc_id", "text", dir,
      numHashes = 64, shingleN = 5)
    // a probe batch near-dupping doc 0's ORIGINAL text and doc 1's
    // FUTURE (replacement) text
    val probe = Seq(
      (10L, "the quick brown fox jumps over the lazy cat and runs far away home"),
      (11L, "galaxies collide slowly over billions of patient dark years out there")
    ).toDF("doc_id", "text")
    val before = pairs(dir, probe)
    assert(before.contains((0L, 10L)) && !before.exists(_._1 == 1L))
    // doc 0 and doc 1 mutate upstream under their reused ids: the
    // audit flags them, the upsert is the remedy
    val mutated = Seq(
      (0L, "entirely new content that no longer resembles the fox sentence at all"),
      (1L, "galaxies collide slowly over billions of patient dark years out here")
    ).toDF("doc_id", "text")
    val audited = Dedup.mutatedRedeliveries(mutated, "doc_id", "text",
        spark.read.parquet(dir), numHashes = 64, shingleN = 5)
      .select("id").as[Long].collect().toSet
    assert(audited === Set(0L, 1L))
    Dedup.upsertSignatures(spark, mutated, "doc_id", "text", dir,
      numHashes = 64, shingleN = 5)
    // exactly one physical row per id — the replacement superseded
    val counts = spark.read.parquet(dir).groupBy("id").count()
      .filter(col("count") > 1).count()
    assert(counts === 0L)
    // the OLD content no longer matches; the NEW content matches
    val after = pairs(dir, probe)
    assert(!after.exists(p => p._1 == 0L || p._2 == 0L),
      "doc 0's old fox content still matches after its replacement")
    assert(after.contains((1L, 11L)),
      "doc 1's new content must match as history")
    // the audit is clean now — store signatures ARE the new content's
    assert(Dedup.mutatedRedeliveries(mutated, "doc_id", "text",
      spark.read.parquet(dir), numHashes = 64,
      shingleN = 5).isEmpty)
    // re-running the upsert (a replayed batch) converges
    Dedup.upsertSignatures(spark, mutated, "doc_id", "text", dir,
      numHashes = 64, shingleN = 5)
    assert(spark.read.parquet(dir).groupBy("id").count()
      .filter(col("count") > 1).count() === 0L)
    assert(pairs(dir, probe) === after)
  }

  test("targeted signature reclaim: reclaimed id re-opens, the other tombstone keeps standing — and keeps its physical row") {
    val dir = tmpDir("sigreclaim")
    Dedup.buildSignatureStore(docs, "doc_id", "text", dir,
      numHashes = 64, shingleN = 5)
    Dedup.deleteSignatures(spark, Seq(0L, 2L).toDF("doc_id"), dir)
    assert(Dedup.reclaimSignatureTombstones(spark,
      Seq(0L).toDF("doc_id"), dir) === 1L)
    // nothing standing for 0 → nothing to reclaim twice
    assert(Dedup.reclaimSignatureTombstones(spark,
      Seq(0L).toDF("doc_id"), dir) === 0L)
    val stored = spark.read.parquet(dir).select("id")
      .as[Long].collect().toSet
    assert(!stored.contains(0L), "reclaimed row not removed")
    assert(stored.contains(2L), "the OTHER tombstoned id lost its row")
    // 0 re-admits via the ordinary append; 2 still drops (takedown)
    Dedup.appendSignatures(spark, docs.filter(col("doc_id").isin(0L, 2L)),
      "doc_id", "text", dir, numHashes = 64, shingleN = 5)
    val after = spark.read.parquet(dir).select("id")
      .as[Long].collect().toSeq
    assert(after.count(_ == 0L) === 1)
    assert(after.count(_ == 2L) === 1, "2's row must not double")
    val probe = Seq(
      (10L, "the quick brown fox jumps over the lazy cat and runs far away home")
    ).toDF("doc_id", "text")
    assert(pairs(dir, probe).contains((0L, 10L)), "0 is history again")
  }

  test("wide simhash store: upsert keeps _wide_meta and the draw gate; new content matches, old stops") {
    val dir = tmpDir("sigupsw")
    Dedup.buildWideSimhashStore(docs, "doc_id", "text", dir,
      portable = true)
    val probeOld = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away house")
    ).toDF("doc_id", "text")
    def widePairs(b: org.apache.spark.sql.DataFrame) =
      Dedup.simhashWideIncremental(spark, b, "doc_id", "text", dir,
          maxHamming = 16, portable = true)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(widePairs(probeOld).contains((0L, 10L)))
    val mutated = Seq(
      (0L, "entirely new content that no longer resembles the fox sentence at all")
    ).toDF("doc_id", "text")
    Dedup.upsertWideSimhashSignatures(spark, mutated, "doc_id", "text",
      dir, portable = true)
    assert(!widePairs(probeOld).exists(p => p._1 == 0L || p._2 == 0L))
    // the meta survived the reclaim and the gate is still loud on a
    // mismatched draw family
    val e = intercept[IllegalArgumentException] {
      Dedup.upsertWideSimhashSignatures(spark, mutated, "doc_id",
        "text", dir, portable = false)
    }
    assert(e.getMessage.contains("draw"))
  }
}
