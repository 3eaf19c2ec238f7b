package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Cluster-disjoint (ROUTED) sharded IVF store — the lever that makes
  * sharding a per-query COST knob instead of a capacity knob: a
  * super-quantizer files each item into the shard of its nearest
  * super-centroid, and queries probe only their routed shards. The
  * spec pins: exactness at full route depth, physical shard pruning at
  * depth 1, the measured routing calibration driving `routeShards = 0`,
  * the append/guard seams, and loud failure after a crashed rebuild. */
class RoutedStoreSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf0001, "embeddings")

  private def tmpStore(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  /** `k` tight clusters around near-orthogonal `dim`-dim directions —
    * the corpus shape cluster-disjoint sharding exists for:
    * neighborhoods land whole inside one shard. */
  private def clustered(n: Int = 200, k: Int = 4,
      dim: Int = 16): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(11)
    val dirs = Seq.tabulate(k) { c =>
      Array.tabulate(dim)(d => if (d % k == c) 1.0 else 0.05 * rnd.nextGaussian())
    }
    (0 until n).map { i =>
      val c = i % k
      (i.toLong, dirs(c).map(x => x + 0.08 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("routed store: full route depth + exhaustive probes equals brute force; shards cluster-disjoint and complete") {
    val dir = tmpStore("ivfrouted")
    val sh = Similarity.buildRoutedIvfStore(emb, dir, shards = 3,
      nlist = 4, m = 4, ksub = 8, dim = 64)
    assert(sh === 3)
    assert(Similarity.isRoutedStore(spark, dir))
    val queries = emb.filter(col("vec_id") < 5)
    // routeShards = shards + exhaustive per-shard probing ⇒ exact:
    // the routed search degenerates to the exhaustive sharded merge
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4, routeShards = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
    // ADC variant with a corpus-sized shortlist is exact too
    val gotAdc = Similarity.searchRoutedIvfStoreAdc(spark, queries, dir,
        k = 5, nprobe = 4, candN = 1000000, routeShards = 3)
      .select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(gotAdc === exact.map(r => (r._1, r._2, r._4)))
    // every item landed in exactly one shard — disjoint and complete —
    // and each item's shard IS its argmax super-centroid (d DESC, id
    // DESC tiebreak), re-derived independently here
    val supers = spark.read.parquet(dir + "/super_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val members = (0 until 3).flatMap(i =>
      spark.read.parquet(s"$dir/shard=$i/encoded")
        .select("item_id").as[Long].collect().map(_ -> i))
    assert(members.size === emb.count())
    assert(members.map(_._1).distinct.size === members.size)
    val vecs = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.unitVec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    members.foreach { case (id, shard) =>
      val want = supers.map { case (sid, cv) => (dot(vecs(id), cv), sid) }
        .max._2
      assert(shard === want, s"item $id filed into shard $shard, " +
        s"nearest super-centroid is $want")
    }
    assert(!new java.io.File(dir + "/_byshard").exists())
  }

  test("routeShards=1 probes ONLY each query's nearest super shard — physically, not just semantically") {
    val df = clustered()
    val dir = tmpStore("ivfrouted1")
    // trained super-quantizer aligns the 4 shards with the 4 clusters
    Similarity.buildRoutedIvfStore(df, dir, shards = 4, nlist = 2,
      dim = 16, superIters = 5)
    val queries = df.filter(col("vec_id") < 8) // 2 per cluster
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val routed = Similarity.searchRoutedIvfStore(spark, queries, dir,
      k = 5, nprobe = 2, routeShards = 1)
    val got = routed.select("query_id", "item_id")
      .as[(Long, Long)].collect().toSet
    // cluster members' neighbors are cluster members, which share the
    // shard — depth-1 routing keeps essentially full recall here
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"depth-1 routed recall on a clustered corpus: $recall")
    // every result item must LIVE in its query's routed (top-super)
    // shard — re-derived independently
    val supers = spark.read.parquet(dir + "/super_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val vecs = df.select(col("vec_id"),
        graft.functions.VectorFunctions.unitVec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    def topShard(id: Long): Int =
      supers.map { case (sid, cv) => (dot(vecs(id), cv), sid) }.max._2
    val memberOf = (0 until 4).flatMap(i =>
      spark.read.parquet(s"$dir/shard=$i/encoded")
        .select("item_id").as[Long].collect().map(_ -> i)).toMap
    got.foreach { case (q, item) =>
      assert(memberOf(item) === topShard(q),
        s"query $q routed to shard ${topShard(q)} but result item $item " +
          s"lives in shard ${memberOf(item)}")
    }
    // PHYSICAL pruning: queries all from cluster 0 route to ONE shard;
    // deleting every OTHER shard's data must not matter — a search that
    // opened them would fail
    val q0 = df.filter(col("vec_id") % 4 === 0 && col("vec_id") < 8)
    val routedShard = topShard(0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 4).filter(_ != routedShard).foreach { i =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/shard=$i/encoded"), true)
    }
    val survivors = Similarity.searchRoutedIvfStore(spark, q0, dir,
        k = 5, nprobe = 2, routeShards = 1)
      .select("query_id", "item_id").as[(Long, Long)].collect()
    assert(survivors.nonEmpty)
    assert(survivors.forall { case (_, item) => memberOf(item) === routedShard })
    // and INSIDE the one routed shard, the list-level probe pruning
    // survives the plan (the q132 spec's assertion, one level down):
    // the scan carries a static list_id partition filter
    val plan = Similarity.searchRoutedIvfStore(spark, q0, dir,
        k = 5, nprobe = 1, routeShards = 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters: [") && l.contains("list_id")),
      "routed per-shard scans must stay list_id partition-pruned:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
  }

  test("routing calibration: monotone curve, persisted depth drives routeShards=0, stale routing falls back loudly") {
    val df = clustered()
    val dir = tmpStore("ivfroutedcal")
    Similarity.buildRoutedIvfStore(df, dir, shards = 4, nlist = 2,
      dim = 16, superIters = 5)
    val queries = df.filter(col("vec_id") < 8)
    // before calibration: advice says recalibrate, no share
    val pre = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(pre.getAs[Boolean]("recalibrate_advised"))
    assert(pre.isNullAt(pre.fieldIndex("route_shards")))
    val chosen = Similarity.calibrateRoutedIvfStore(spark, dir, queries,
      k = 5, targetRecall = 1.0, sampleN = 8)
    assert(chosen >= 1 && chosen <= 4)
    // the curve is a monotone CDF ending at 1.0 (full depth = full
    // recall by construction)
    val curve = spark.read.parquet(dir + "/routing_curve")
      .orderBy("route_shards")
      .as[(Int, Double)].collect()
    assert(curve.sliding(2).forall {
      case Array((_, a), (_, b)) => b >= a; case _ => true })
    assert(math.abs(curve.last._2 - 1.0) < 1e-9)
    // routeShards = 0 consumes the persisted depth: identical to the
    // explicit depth, query for query
    val auto = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 2, routeShards = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    val explicit = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 2, routeShards = chosen)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(auto === explicit)
    // calibrated advice: share = chosen / shards, no recalibration
    val post = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(!post.getAs[Boolean]("recalibrate_advised"))
    assert(post.getAs[Int]("route_shards") === chosen)
    assert(math.abs(post.getAs[Double]("routed_share") - chosen / 4.0) < 1e-9)
    // STALE routing (calibrated against a different super-quantizer):
    // rebuild wipes it by design; restore the old record manually and
    // assert the search ignores it and probes all shards (recall-safe)
    Similarity.buildRoutedIvfStore(df, dir, shards = 2, nlist = 2,
      dim = 16, superIters = 5)
    assert(!new java.io.File(dir + "/routing").exists(),
      "a rebuild must invalidate the routing calibration")
    // restore the OLD calibration record (measured against 4 shards)
    // next to the 2-shard rebuild — the stale-super scenario
    Seq((chosen, 1.0, 5, 8, 200L, 4))
      .toDF("route_shards", "target_recall", "k", "sample_n",
        "n_items", "n_shards")
      .write.mode("overwrite").parquet(dir + "/routing")
    val fallback = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 2, routeShards = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exhaustive = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 2, routeShards = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fallback === exhaustive,
      "stale routing must fall back to probing all shards")
  }

  test("routed append files by super-quantizer; the hash/routed append guards are loud") {
    val dir = tmpStore("ivfroutedapp")
    Similarity.buildRoutedIvfStore(emb.filter(col("vec_id") % 2 === 0),
      dir, shards = 3, nlist = 4, dim = 64)
    Similarity.appendToRoutedIvfStore(spark,
      emb.filter(col("vec_id") % 2 === 1), dir)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4, routeShards = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
    // hash append on a routed store would file vectors where the
    // router never looks — refused loudly
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendToShardedIvfStore(spark, queries, dir)
    }
    assert(e1.getMessage.contains("ROUTED"))
    // routed append on a hash store has no super-quantizer — loud too
    val hashDir = tmpStore("ivfhashguard")
    Similarity.buildShardedIvfStore(emb, hashDir, shards = 2,
      nlist = 4, dim = 64)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.appendToRoutedIvfStore(spark, queries, hashDir)
    }
    assert(e2.getMessage.contains("no super-quantizer"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.searchRoutedIvfStore(spark, queries, hashDir, k = 5)
    }
    assert(e3.getMessage.contains("no super-quantizer"))
  }

  test("16-shard routed search on the bounded prep pool stays exact (many-shard smoke)") {
    // 16 shards exercises perShardCand past its own thread cap — the
    // dedicated bounded pool (r11 advice: the global fork-join pool
    // could starve under blocking per-shard prep at high shard counts)
    val df = clustered(n = 480, k = 16, dim = 16)
    val dir = tmpStore("ivfrouted16")
    val sh = Similarity.buildRoutedIvfStore(df, dir, shards = 16,
      nlist = 2, dim = 16, superIters = 3)
    assert(sh === 16)
    val queries = df.filter(col("vec_id") < 4)
    // full route depth + exhaustive per-shard probing ⇒ exact, with
    // all 16 per-shard preps racing on the bounded pool
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 2, routeShards = 16)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
  }

  test("in-place rebuild deletes shards whose new staging partition is empty — no stale corpus survives") {
    val dir = tmpStore("ivfroutedstale")
    Similarity.buildRoutedIvfStore(emb, dir, shards = 3, nlist = 4,
      dim = 64)
    (0 until 3).foreach(i => assert(
      new java.io.File(s"$dir/shard=$i/encoded").exists()))
    // rebuild IN PLACE with 21 copies of one vector: every item
    // argmax-assigns to the same super-centroid, so two of the three
    // staging partitions are empty — their previous shard dirs (old
    // vectors, old quantizers) must be DELETED, not silently served
    // under the new super-quantizer (r11 advice)
    val one = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).collect()
      .head.getSeq[Double](0)
    val tiny = (100L until 121L).map(i => (i, one))
      .toDF("vec_id", "embedding")
    Similarity.buildRoutedIvfStore(tiny, dir, shards = 3, nlist = 2,
      dim = 64)
    val stored = (0 until 3).flatMap { i =>
      val p = new java.io.File(s"$dir/shard=$i/encoded")
      if (p.exists()) spark.read.parquet(p.toString)
        .select("item_id").as[Long].collect()
      else Nil
    }
    assert(stored.toSet === (100L until 121L).toSet,
      s"rebuilt store must hold exactly the new corpus, got ${stored.sorted}")
    val got = Similarity.searchRoutedIvfStore(spark,
        tiny.filter(col("vec_id") === 100), dir, k = 30, nprobe = 4,
        routeShards = 3)
      .select("item_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ >= 100L),
      s"search must never surface the previous build's corpus: $got")
    // same contract on the hash-sharded build: rebuild with a batch
    // that hashes entirely into one shard
    val hashDir = tmpStore("ivfhashstale")
    Similarity.buildShardedIvfStore(emb, hashDir, shards = 2, nlist = 4,
      dim = 64)
    val oneShard = emb.withColumn("s",
        graft.functions.PortableHash.h60(col("vec_id")) % 2)
      .filter(col("s") === 0).drop("s").limit(20)
    Similarity.buildShardedIvfStore(oneShard, hashDir, shards = 2,
      nlist = 2, dim = 64)
    val keptIds = oneShard.select("vec_id").as[Long].collect().toSet
    val hashStored = (0 until 2).flatMap { i =>
      val p = new java.io.File(s"$hashDir/shard=$i/encoded")
      if (p.exists()) spark.read.parquet(p.toString)
        .select("item_id").as[Long].collect()
      else Nil
    }
    assert(hashStored.toSet === keptIds)
  }

  test("splitHotShard: same neighbors as pre-split, invariant preserved, imbalance reduced, work stays incremental") {
    import graft.functions.{VectorFunctions => VF}
    // skewed fixture: cluster 0 owns half the corpus, 7 small clusters
    // share the rest — shards=4 under a trained super leaves cluster
    // 0's shard hot
    val rnd = new scala.util.Random(7)
    val dirs8 = Seq.tabulate(8) { c =>
      Array.tabulate(16)(d => if (d % 8 == c) 1.0 else 0.05 * rnd.nextGaussian())
    }
    val df = (0 until 400).map { i =>
      val c = if (i % 2 == 0) 0 else 1 + (i / 2) % 7
      (i.toLong, dirs8(c).map(x => x + 0.08 * rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
    val dir = tmpStore("ivfsplit")
    val sh = Similarity.buildRoutedIvfStore(df, dir, shards = 4,
      nlist = 4, dim = 16, superIters = 5)
    val queries = df.filter(col("vec_id") < 8)
    Similarity.calibrateRoutedIvfStore(spark, dir, queries, k = 5,
      targetRecall = 0.9, sampleN = 8)
    def shardSizes(n: Int): Seq[Long] = (0 until n).map { i =>
      val p = new java.io.File(s"$dir/shard=$i/encoded")
      if (p.exists()) spark.read.parquet(p.toString).count() else 0L
    }
    val before = shardSizes(sh)
    val imbalBefore = before.max.toDouble / (before.sum.toDouble / sh)
    // the fixture is built hot on purpose — the advisory must say so
    val preAdv = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(math.abs(preAdv.getAs[Double]("shard_imbalance") - imbalBefore)
      < 1e-9)
    assert(imbalBefore >= 1.5 && preAdv.getAs[Boolean]("split_advised"),
      s"skewed fixture must trip split_advised (imbalance $imbalBefore)")
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    // record which items the COLD shards held — the incremental
    // contract: untouched shards' stored files are never rewritten
    val hot = before.zipWithIndex.max._2
    val coldFiles = (0 until sh).filter(_ != hot).map { i =>
      i -> new java.io.File(s"$dir/shard=$i/encoded").listFiles()
        .map(f => f.getName -> f.lastModified()).toSet
    }.toMap
    val newSh = Similarity.splitHotShard(spark, dir, splitIters = 4,
      nlist = 4)
    assert(newSh === sh + 1)
    // post-split exhaustive search ≡ pre-split exhaustive ≡ brute force
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4, routeShards = newSh)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact, "split must not change the stored corpus")
    // routing calibration is stale by construction — invalidated
    assert(!new java.io.File(dir + "/routing").exists(),
      "split must invalidate the routing calibration")
    // disjoint + complete, and every item still lives in its argmax
    // super shard — exact for THIS fixture (its cold clusters sit far
    // from the split children, so no cold item's argmax moves); in
    // general the invariant is exact only for re-filed hot items, see
    // the splitHotShard scaladoc
    val supers = spark.read.parquet(dir + "/super_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(supers.length === newSh)
    val members = (0 until newSh).flatMap { i =>
      val p = new java.io.File(s"$dir/shard=$i/encoded")
      if (p.exists()) spark.read.parquet(p.toString)
        .select("item_id").as[Long].collect().map(_ -> i)
      else Nil
    }
    assert(members.size === 400)
    assert(members.map(_._1).distinct.size === 400)
    val vecs = df.select(col("vec_id"), VF.unitVec(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    members.foreach { case (id, s) =>
      val want = supers.map { case (sid, cv) => (dot(vecs(id), cv), sid) }
        .max._2
      assert(s === want, s"item $id in shard $s, argmax super is $want")
    }
    // imbalance strictly reduced on this skewed fixture
    val after = shardSizes(newSh)
    val imbalAfter = after.max.toDouble / (after.sum.toDouble / newSh)
    assert(imbalAfter < imbalBefore,
      s"imbalance $imbalBefore -> $imbalAfter must fall")
    // the advisory reads the same numbers: it flagged the skew before
    // (this fixture is built ≥1.5× imbalanced) and reports the
    // post-split measurement — the operational loop is advice →
    // splitHotShard in a maintenance window → advice again
    val adv = Similarity.routedStoreAdvice(spark, dir).collect().head
    assert(math.abs(adv.getAs[Double]("shard_imbalance") - imbalAfter)
      < 1e-9)
    assert(adv.getAs[Boolean]("split_advised") === (imbalAfter >= 1.5))
    // incremental contract: a cold shard that received no stragglers
    // kept its files byte-untouched (same names + mtimes)
    val untouched = coldFiles.filter { case (i, files) =>
      new java.io.File(s"$dir/shard=$i/encoded").listFiles().map(f =>
        f.getName -> f.lastModified()).toSet == files
    }
    assert(untouched.nonEmpty,
      "at least one cold shard must survive the split without a rewrite")
    // post-split maintenance continues to work: recalibrate + append
    val depth = Similarity.calibrateRoutedIvfStore(spark, dir, queries,
      k = 5, targetRecall = 0.9, sampleN = 8)
    assert(depth >= 1 && depth <= newSh)
    Similarity.appendToRoutedIvfStore(spark,
      Seq((1000L, dirs8(0).map(_ + 0.01).toSeq)).toDF("vec_id", "embedding"),
      dir)
    val aug = Similarity.searchRoutedIvfStore(spark,
        df.filter(col("vec_id") === 0), dir, k = 400, nprobe = 4,
        routeShards = newSh)
      .select("item_id").as[Long].collect().toSet
    assert(aug.contains(1000L))
  }

  test("a crashed rebuild leaves the store failing LOUDLY, never routing with stale records") {
    val dir = tmpStore("ivfroutedcrash")
    Similarity.buildRoutedIvfStore(emb, dir, shards = 2, nlist = 4,
      dim = 64)
    // a rebuild that dies before completing: the poisoned corpus
    // throws on first evaluation, AFTER the invalidation step
    val poison = emb.select(col("vec_id"),
      when(lit(false), col("embedding"))
        .otherwise(raise_error(lit("simulated rebuild crash")))
        .as("embedding"))
    intercept[Exception] {
      Similarity.buildRoutedIvfStore(poison, dir, shards = 2, nlist = 4,
        dim = 64)
    }
    // the records were invalidated first — reads fail loudly instead
    // of consuming the previous build's sharding/super over debris
    val e = intercept[IllegalArgumentException] {
      Similarity.searchRoutedIvfStore(spark,
        emb.filter(col("vec_id") < 5), dir, k = 5)
    }
    assert(e.getMessage.contains("no super-quantizer") ||
      e.getMessage.contains("no sharding record"))
  }
}
