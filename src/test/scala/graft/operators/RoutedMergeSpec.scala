package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** mergeColdShards — the inverse of splitHotShard, closing shard-count
  * monotonicity: repeated splits only grow the shard set while the
  * soak measured per-shard FIXED job cost dominating small batches.
  * Pins: the q135-style invariant (post-merge exhaustive search ≡
  * pre-merge ≡ brute force), dense shard ids with the last shard
  * renamed into the freed slot (files untouched), the cold-pair
  * advisory, tombstone reclaim through the merge, the staged-recovery
  * protocol shared with the split — including the one window where a
  * naive resume would destroy data: re-deleting shard=hi AFTER the
  * rename already moved the last shard (whose only copy it is) into
  * that slot. */
class RoutedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  /** 4 near-orthogonal clusters with two DELIBERATELY tiny ones — the
    * shape that leaves two cold shards after a 4-shard trained build. */
  private lazy val fixture = {
    val rnd = new scala.util.Random(23)
    val dirs = Seq.tabulate(4) { c =>
      Array.tabulate(16)(d => if (d % 4 == c) 1.0 else 0.04 * rnd.nextGaussian())
    }
    (0 until 260).map { i =>
      val c = if (i < 120) 0 else if (i < 240) 1 else if (i % 2 == 0) 2 else 3
      (i.toLong, dirs(c).map(x => x + 0.06 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries = fixture.filter(col("vec_id") < 6)
  private def truthOver(corpus: org.apache.spark.sql.DataFrame) =
    Similarity.bruteForceTopK(corpus, queries, 5)
      .as[(Long, Long, Double, Int)].collect().toSet

  private def exhaustive(dir: String, n: Int) =
    Similarity.searchRoutedIvfStore(spark, queries, dir, k = 5,
        nprobe = 8, routeShards = n)
      .as[(Long, Long, Double, Int)].collect().toSet

  private def build(dir: String): Int =
    Similarity.buildRoutedIvfStore(fixture, dir, shards = 4, nlist = 4,
      dim = 16, superIters = 5)

  private def shardIds(dir: String, n: Int): Seq[Long] = (0 until n).map { i =>
    val p = new java.io.File(s"$dir/shard=$i/encoded")
    if (p.exists()) spark.read.parquet(p.toString).count() else 0L
  }

  test("mergeColdShards: invariant holds, ids dense, cold pair merged, untouched shards byte-identical, advisory loop closes") {
    val dir = tmpStore("ivfmerge")
    val sh = build(dir)
    assert(sh === 4)
    val truth = truthOver(fixture)
    assert(exhaustive(dir, 4) === truth)
    val before = shardIds(dir, 4)
    val coldPair = before.zipWithIndex.sorted.take(2).map(_._2).sorted
    // the advisory flags the cold pair on this deliberately-cold fixture
    val adv = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(adv.getAs[Boolean]("merge_advised"),
      s"two tiny shards must trip merge_advised (sizes $before)")
    assert(adv.getSeq[Int](adv.fieldIndex("cold_shards")) === coldPair)
    // record untouched shards' file state (neither merged nor moved);
    // when the cold pair already contains the last shard no rename
    // happens — the move assertions below adapt
    val renames = coldPair.max != 3
    val untouchedIds = (0 until 4)
      .filterNot(i => coldPair.contains(i) || i == 3)
    val untouchedFiles = untouchedIds.map { i =>
      i -> new java.io.File(s"$dir/shard=$i/encoded").listFiles()
        .map(f => f.getName -> f.lastModified()).toSet
    }.toMap
    val movedFiles =
      if (renames) new java.io.File(s"$dir/shard=3/encoded")
        .listFiles().map(_.getName).toSet
      else Set.empty[String]
    val newSh = Similarity.mergeColdShards(spark, dir, nlist = 4)
    assert(newSh === 3)
    // the q135 invariant: nothing lost, duplicated, or misfiled
    assert(exhaustive(dir, 3) === truth)
    // dense ids: shards 0..2 exist, shard 3 gone
    assert((0 until 3).forall(i =>
      new java.io.File(s"$dir/shard=$i/encoded").exists()))
    assert(!new java.io.File(s"$dir/shard=3").exists())
    // untouched shards kept their files byte-identical (minus any
    // straggler append, which adds files without rewriting old ones)
    untouchedIds.foreach { i =>
      val now = new java.io.File(s"$dir/shard=$i/encoded").listFiles()
        .map(f => f.getName -> f.lastModified()).toSet
      assert(untouchedFiles(i).subsetOf(now),
        s"untouched shard $i lost or rewrote files")
    }
    // the moved shard's FILES survived the rename (same names, new slot)
    if (renames) {
      val movedNow = new java.io.File(
        s"$dir/shard=${coldPair.max}/encoded").listFiles()
        .map(_.getName).toSet
      assert(movedFiles.subsetOf(movedNow),
        "the last shard's files must survive the rename into the freed slot")
    }
    // routing invalidated by design; recalibrate + append still work
    assert(!new java.io.File(dir + "/routing").exists())
    val depth = Similarity.calibrateRoutedIvfStore(spark, dir, queries,
      k = 5, targetRecall = 1.0, sampleN = 6)
    assert(depth >= 1 && depth <= 3)
    Similarity.appendToRoutedIvfStore(spark,
      Seq((9999L, fixture.filter(col("vec_id") === 0)
        .select("embedding").as[Seq[Double]].head())
      ).toDF("vec_id", "embedding"), dir)
    assert(Similarity.searchRoutedIvfStore(spark,
        fixture.filter(col("vec_id") === 0), dir, k = 261, nprobe = 8,
        routeShards = 3)
      .select("item_id").as[Long].collect().toSet.contains(9999L))
    // post-merge advisory reads the new shape
    val adv2 = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(adv2.getAs[Int]("n_shards") === 3)
  }

  test("merge composes with tombstones: LIVE items only re-file, both merged dirs' tombstones reclaimed") {
    val dir = tmpStore("ivfmergedel")
    build(dir)
    val gone = fixture.filter(col("vec_id") % 13 === 2).select("vec_id")
    Similarity.deleteFromShardedIvfStore(spark, gone, dir)
    val remaining = fixture.filter(col("vec_id") % 13 =!= 2)
    val truth = truthOver(remaining)
    assert(exhaustive(dir, 4) === truth)
    val newSh = Similarity.mergeColdShards(spark, dir, nlist = 4)
    assert(newSh === 3)
    assert(exhaustive(dir, 3) === truth)
    // membership is disjoint and no deleted id was resurrected into
    // the merged shard (cold dirs' physical tombstoned rows died with
    // their dirs; untouched shards may still hold tombstoned rows,
    // which stay excluded — proven by the search equality above)
    val ids = (0 until 3).flatMap { i =>
      val p = new java.io.File(s"$dir/shard=$i/encoded")
      if (p.exists()) spark.read.parquet(p.toString)
        .select("item_id").as[Long].collect()
      else Nil
    }
    assert(ids.size === ids.distinct.size)
  }

  test("resume after the RENAME window must not re-delete the moved shard (the last_built gate)") {
    val dir = tmpStore("ivfmergecrash")
    build(dir)
    val truth = truthOver(fixture)
    // explicit pair with hi != last shard, so the rename step fires
    Similarity.stageMerge(spark, dir, a = 0, b = 1, nlist = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = spark.read.parquet(dir + "/_merge_staging/meta")
      .collect().head
    val (lo, hi, sh) = (meta.getAs[Int]("lo"), meta.getAs[Int]("hi"),
      meta.getAs[Int]("shards"))
    assert(lo === 0 && hi === 1)
    assert(meta.getAs[Boolean]("last_built"))
    // replicate the mutation up to AND INCLUDING the rename, then "die"
    Seq("sharding", "super_centroids", "routing", "routing_curve")
      .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$f"), true))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/shard=$lo"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/shard=$hi"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/shard=${sh - 1}"),
      new org.apache.hadoop.fs.Path(s"$dir/shard=$hi")))
    // reads are loud; mutations refuse
    intercept[IllegalArgumentException] {
      Similarity.searchRoutedIvfStore(spark, queries, dir, k = 5)
    }
    val g = intercept[IllegalArgumentException] {
      Similarity.appendToRoutedIvfStore(spark,
        Seq((1L, Seq.fill(16)(0.5))).toDF("vec_id", "embedding"), dir)
    }
    assert(g.getMessage.contains("staged merge"))
    intercept[IllegalArgumentException] {
      Similarity.splitHotShard(spark, dir)
    }
    // resume: the moved shard (now at slot hi) must SURVIVE — before
    // the last_built gate, the re-run would fs.delete(shard=hi) and
    // permanently destroy the only copy of the last shard's vectors
    assert(Similarity.resumeMergeColdShards(spark, dir) === sh - 1)
    assert(exhaustive(dir, sh - 1) === truth)
    assert(!new java.io.File(dir + "/_merge_staging").exists())
  }

  test("merge staged but not applied: store intact; resume cleans debris and says so") {
    val dir = tmpStore("ivfmergeintact")
    build(dir)
    val truth = truthOver(fixture)
    Similarity.stageMerge(spark, dir, nlist = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      dir + "/_merge_staging/meta"), true)
    assert(exhaustive(dir, 4) === truth) // untouched
    val e = intercept[IllegalStateException] {
      Similarity.resumeMergeColdShards(spark, dir)
    }
    assert(e.getMessage.contains("intact"))
    assert(!new java.io.File(dir + "/_merge_staging").exists())
    assert(Similarity.mergeColdShards(spark, dir, nlist = 4) === 3)
    assert(exhaustive(dir, 3) === truth)
  }

  test("merge guards: below 3 shards refused; explicit bad pair refused") {
    val dir = tmpStore("ivfmergeguard")
    Similarity.buildRoutedIvfStore(fixture, dir, shards = 2, nlist = 4,
      dim = 16, superIters = 3)
    val e = intercept[IllegalArgumentException] {
      Similarity.mergeColdShards(spark, dir)
    }
    assert(e.getMessage.contains("collapse routing"))
    val dir4 = tmpStore("ivfmergeguard4")
    build(dir4)
    intercept[IllegalArgumentException] {
      Similarity.mergeColdShards(spark, dir4, a = 1, b = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.mergeColdShards(spark, dir4, a = 0, b = 9)
    }
  }
}
