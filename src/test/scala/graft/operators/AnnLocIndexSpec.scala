package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The id→list location index (round 14): store mutations locate a
  * CDC batch's rows in O(batch) bucket reads instead of a narrow
  * O(corpus) encoded scan per shard per micro-batch — the measured
  * fixed-cost floor of the r13 lifecycle work. The index is an
  * OPTIMIZATION over a superset invariant (entries land before rows,
  * removals leave stale entries, lookups re-verify against the
  * encoded table); these tests pin exactly the windows where that
  * invariant is the only thing standing between a fast lookup and a
  * silently-missed row: stale entries after reclaim, orphan entries
  * from a death between the index and encoded writes, the absent-
  * index fallback, and the rebuild-into-existing-dir drop. */
class AnnLocIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf0001, "embeddings")

  private def tmpStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def locDir(dir: String) = new java.io.File(dir + "/loc")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "item_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("lazy creation at first mutation; lookups name the true lists; append maintains it; never-stored ids prove empty") {
    val dir = tmpStore("annloc")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    // builds do NOT create the index (an eager build would tax every
    // construction with a corpus pass whether or not the store ever
    // mutates); the FIRST mutation does — even a no-op delete
    assert(!locDir(dir).exists(), "build must not create loc/")
    assert(Similarity.deleteFromIvfStore(spark,
      Seq(9999L).toDF("vec_id"), dir) === 0L)
    assert(locDir(dir).exists(),
      "the first mutation must lazily create loc/")
    // every stored id's true (item_id, list_id) is covered
    val truth = spark.read.parquet(dir + "/encoded")
      .select("item_id", "list_id").as[(Long, Int)].collect().toMap
    val some = Seq(3L, 77L, 150L).toDF("item_id")
    val cands = AnnLocIndex.candidateLists(spark, dir, some)
    assert(cands.isDefined)
    assert(Seq(3L, 77L, 150L).map(truth).toSet.subsetOf(cands.get),
      "candidate lists must cover the true locations")
    // ids never stored: the index PROVES absence (the cold-shard path)
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(9999L, 8888L).toDF("item_id")) === Some(Set.empty[Int]))
    // appends register their locations (index stays a superset)
    Similarity.appendToIvfStore(spark,
      emb.filter(col("vec_id") === 333), dir)
    val newLoc = spark.read.parquet(dir + "/encoded")
      .filter(col("item_id") === 333).select("list_id")
      .as[Int].head()
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(333L).toDF("item_id")).get.contains(newLoc))
  }

  test("stale entries after reclaim are absorbed (superset, never wrong); compact sheds them") {
    val dir = tmpStore("annlocstale")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    val oldList = spark.read.parquet(dir + "/encoded")
      .filter(col("item_id") === 5).select("list_id").as[Int].head()
    // replace id 5 with a reversed vector: the old row reclaims, the
    // new one may file elsewhere — the index now holds BOTH entries
    Similarity.upsertIntoIvfStore(spark,
      emb.filter(col("vec_id") === 5)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      dir)
    val cands = AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).get
    assert(cands.contains(oldList), "stale entry expected (superset)")
    // correctness through the staleness: delete locates the LIVE row
    assert(Similarity.deleteFromIvfStore(spark, Seq(5L).toDF("vec_id"),
      dir) === 1L)
    val queries = emb.filter(col("vec_id") < 3)
    val net = emb.filter(col("vec_id") < 200 && col("vec_id") =!= 5)
    assert(asSet(Similarity.searchIvfStore(spark, queries, dir, k = 5,
      nprobe = 8)) === asSet(Similarity.bruteForceTopK(net, queries, 5)))
    // compaction rebuilds the index from the clean table: exact again
    Similarity.compactIvfStore(spark, dir)
    val after = AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).get
    assert(after === Set.empty[Int],
      s"compact must shed the reclaimed id's entries, got $after")
  }

  test("orphan index entries (death between index and encoded writes) are absorbed; the missing-entry direction cannot occur by ordering") {
    val dir = tmpStore("annlocorphan")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    AnnLocIndex.ensure(spark, dir) // lazy-create (appends no-op on an absent index)
    // simulate the one crash window the protocol permits: the index
    // append committed, the encoded append did not — an ORPHAN entry
    AnnLocIndex.append(spark, Seq((555L, 3)).toDF("item_id", "list_id"),
      dir)
    // lookups surface the orphan as a candidate…
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(555L).toDF("item_id")).get.contains(3))
    // …and every mutation re-verifies against the encoded truth:
    // delete tombstones nothing, upsert files nothing for the orphan
    assert(Similarity.deleteFromIvfStore(spark,
      Seq(555L).toDF("vec_id"), dir) === 0L)
    assert(Similarity.reclaimTombstones(spark,
      Seq(555L).toDF("vec_id"), dir) === 0L)
    // the healed re-run (appendToIvfStore of the same batch) lands the
    // row; the duplicate index entry is harmless
    Similarity.appendToIvfStore(spark,
      emb.filter(col("vec_id") === 555), dir)
    val queries = emb.filter(col("vec_id") < 3)
    val net = emb.filter(col("vec_id") < 200 || col("vec_id") === 555)
    assert(asSet(Similarity.searchIvfStore(spark, queries, dir, k = 5,
      nprobe = 8)) === asSet(Similarity.bruteForceTopK(net, queries, 5)))
  }

  test("dropped index (rebuild crash window / legacy store): lookups read None, the next mutation re-creates it, compact refreshes it") {
    val dir = tmpStore("annloclegacy")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    AnnLocIndex.ensure(spark, dir)
    assert(locDir(dir).exists())
    // the rebuild-crash / legacy state: loc/ absent
    AnnLocIndex.drop(spark, dir)
    assert(!locDir(dir).exists())
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).isEmpty, "absent index must read None")
    // the whole mutation family keeps working — the first mutation
    // re-creates the index from the encoded truth and proceeds pruned
    Similarity.deleteFromIvfStore(spark, Seq(7L).toDF("vec_id"), dir)
    assert(locDir(dir).exists(),
      "the first mutation after a drop must re-create loc/")
    Similarity.upsertIntoIvfStore(spark,
      emb.filter(col("vec_id") === 9)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      dir)
    val queries = emb.filter(col("vec_id") < 3)
    val net = emb.filter(col("vec_id") < 200 && col("vec_id") =!= 7)
      .withColumn("embedding", when(col("vec_id") === 9,
        reverse(col("embedding"))).otherwise(col("embedding")))
    assert(asSet(Similarity.searchIvfStore(spark, queries, dir, k = 5,
      nprobe = 8)) === asSet(Similarity.bruteForceTopK(net, queries, 5)))
    // compaction refreshes (sheds stale entries)
    Similarity.compactIvfStore(spark, dir)
    assert(locDir(dir).exists(), "compact must rebuild loc/")
    val loc9 = spark.read.parquet(dir + "/encoded")
      .filter(col("item_id") === 9).select("list_id").as[Int].head()
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(9L).toDF("item_id")).get === Set(loc9))
  }

  test("ids frames of a different integral type read the same buckets (hash canonicalization)") {
    val dir = tmpStore("annloctype")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    Similarity.deleteFromIvfStore(spark, Seq(9999L).toDF("vec_id"), dir)
    // an INT-typed ids frame against the long-id store: xxhash64
    // hashes int and long values differently, so without the
    // canonical cast the lookup reads the WRONG buckets and proves
    // (falsely) that the ids are absent — the delete then files
    // nothing, silently
    val intIds = Seq(5, 77).toDF("vec_id")
      .select(col("vec_id").cast("int").as("vec_id"))
    assert(intIds.schema.head.dataType ===
      org.apache.spark.sql.types.IntegerType)
    val truth = spark.read.parquet(dir + "/encoded")
      .filter(col("item_id").isin(5L, 77L))
      .select("item_id", "list_id").as[(Long, Int)].collect().toMap
    val cands = AnnLocIndex.candidateLists(spark, dir,
      intIds.select(col("vec_id").as("item_id"))).get
    assert(Seq(5L, 77L).map(truth).toSet.subsetOf(cands),
      s"int-typed lookup must cover the true lists, got $cands")
    // and the public mutation API actually mutates through it
    assert(Similarity.deleteFromIvfStore(spark, intIds, dir) === 2L)
    val queries = emb.filter(col("vec_id") < 3)
    val net = emb.filter(col("vec_id") < 200 &&
      !col("vec_id").isin(5L, 77L))
    assert(asSet(Similarity.searchIvfStore(spark, queries, dir, k = 5,
      nprobe = 8)) === asSet(Similarity.bruteForceTopK(net, queries, 5)))
  }

  test("compacting a fully-reclaimed store drops the index instead of failing on the empty encoded table") {
    val dir = tmpStore("annlocempty")
    val tiny = emb.filter(col("vec_id") < 20)
    Similarity.buildIvfStore(tiny, dir, nlist = 2)
    assert(Similarity.deleteFromIvfStore(spark,
      tiny.select("vec_id"), dir) === 20L)
    // every row tombstoned: compaction reclaims them ALL — the index
    // rebuild at the end must not throw on the now-empty encoded
    // table (the tombstone log is already cleared by this point; a
    // failure here would leave the store needing manual repair)
    Similarity.compactIvfStore(spark, dir)
    assert(!locDir(dir).exists(),
      "an empty store has nothing to index — rebuild must drop loc/")
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).isEmpty, "absent index must read None")
  }

  test("a legacy _meta (bare bucket count, pre-scheme-marker) reads as NO index and migrates at the next mutation") {
    val dir = tmpStore("annlocmarker")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 200), dir,
      nlist = 8)
    Similarity.deleteFromIvfStore(spark, Seq(9999L).toDF("vec_id"), dir)
    assert(AnnLocIndex.buckets(spark, dir).isDefined)
    // rewrite _meta in the LEGACY format (a bare count, no scheme
    // marker) — the on-disk state of an index built before the r15
    // canonical-type hash fix. Reading it with the NEW hash would
    // prune non-long integral ids to the wrong buckets with no error
    // (the silent-empty-candidates failure mode), so it must read as
    // "no index" until rebuilt
    val metaFile = new org.apache.hadoop.fs.Path(dir + "/loc/_meta")
    val f = metaFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(metaFile, true)
    try out.write("64".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(AnnLocIndex.buckets(spark, dir).isEmpty,
      "a schemeless marker must read as no index (full-scan fallback)")
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).isEmpty)
    // the mutation family still works — location falls back to the
    // full scan, and ensure() migrates the index to the new marker
    assert(Similarity.deleteFromIvfStore(spark, Seq(7L).toDF("vec_id"),
      dir) === 1L)
    assert(AnnLocIndex.buckets(spark, dir).isDefined,
      "the first mutation must rebuild a current-scheme index")
    val queries = emb.filter(col("vec_id") < 3)
    val net = emb.filter(col("vec_id") < 200 && col("vec_id") =!= 7)
    assert(asSet(Similarity.searchIvfStore(spark, queries, dir, k = 5,
      nprobe = 8)) === asSet(Similarity.bruteForceTopK(net, queries, 5)))
  }

  test("crashed-write debris under encoded/_temporary does not count as data — the empty-store rebuild still drops the index") {
    val dir = tmpStore("annlocdebris")
    val tiny = emb.filter(col("vec_id") < 20)
    Similarity.buildIvfStore(tiny, dir, nlist = 2)
    assert(Similarity.deleteFromIvfStore(spark,
      tiny.select("vec_id"), dir) === 20L)
    // a crashed write's debris: a committed-looking leaf under an
    // underscore ancestor. The parquet read ignores _temporary
    // entirely, so counting this as data would send the rebuild into
    // the "unable to infer schema" failure the empty guard prevents
    val debris = new org.apache.hadoop.fs.Path(
      dir + "/encoded/_temporary/0/part-00000-dead.parquet")
    val f = debris.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(debris, true).close()
    Similarity.compactIvfStore(spark, dir)
    assert(!locDir(dir).exists(),
      "debris-only store is EMPTY — rebuild must drop loc/, not read it")
  }

  test("rebuild into an existing dir drops the index — entries describe the NEW corpus only once re-created") {
    val dir = tmpStore("annlocrebuild")
    Similarity.buildIvfStore(emb.filter(col("vec_id") < 100), dir,
      nlist = 4)
    Similarity.deleteFromIvfStore(spark, Seq(9999L).toDF("vec_id"), dir)
    assert(locDir(dir).exists())
    // second build, different corpus slice and quantizer size: the
    // OLD index would be a non-superset over the new assignments —
    // the one state lookups cannot absorb — so the build DROPS it
    Similarity.buildIvfStore(emb.filter(col("vec_id").between(100, 299)),
      dir, nlist = 8)
    assert(!locDir(dir).exists(),
      "a rebuild into an existing dir must drop the stale index")
    // first mutation re-creates from the NEW corpus: an old-corpus id
    // proves absent; a new-corpus id locates exactly
    Similarity.deleteFromIvfStore(spark, Seq(9999L).toDF("vec_id"), dir)
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(5L).toDF("item_id")).get === Set.empty[Int])
    val loc150 = spark.read.parquet(dir + "/encoded")
      .filter(col("item_id") === 150).select("list_id").as[Int].head()
    assert(AnnLocIndex.candidateLists(spark, dir,
      Seq(150L).toDF("item_id")).get === Set(loc150))
  }
}
