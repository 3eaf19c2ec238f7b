package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement (not part of the driver contract): the cost of the
  * round-13 store-lifecycle operations vs their displaced rival — a
  * full rebuild. For each corpus spec:
  *
  *  - build a routed store, time a baseline exhaustive routed search;
  *  - DELETE a ~10% id subset (tombstones), time the delete and the
  *    search over the tombstoned store (the standing-tombstone tax);
  *  - COMPACT every shard dir (physical reclaim), time it, search
  *    again (post-reclaim), and verify the search equals brute force
  *    over the remaining corpus at every stage;
  *  - time the rival: a full rebuild from the remaining corpus;
  *  - MERGE the two coldest shards, time it, verify equivalence again.
  *
  * One JSON line per corpus. Uses SplitCost's zipf-ish synth corpus
  * (`synth:N:C`) so the shard shapes match the split measurements in
  * SCALING.md.
  */
object LifecycleCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    def synth(n: Int, clusters: Int, dim: Int = 32): DataFrame = {
      val rnd = new scala.util.Random(42)
      val centers = Seq.fill(clusters)(Array.fill(dim)(rnd.nextGaussian()))
      val w = Array.tabulate(clusters)(c => 1.0 / (c + 1))
      val cum = w.scanLeft(0.0)(_ + _).tail.map(_ / w.sum)
      (0 until n).map { i =>
        val u = ((i * 2654435761L) % 1000003).toDouble / 1000003
        val c = cum.indexWhere(u <= _) match {
          case -1 => clusters - 1; case x => x }
        (i.toLong, centers(c).map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
      }.toDF("vec_id", "embedding")
    }

    args.foreach { spec =>
      // synth:N:C[:S] — S = shard count (default 4), the r14 sweep
      // axis: the cold-shard fast path should hold the per-batch
      // FLOOR sub-linear in S (a shard holding none of the batch
      // answers from its location-index bucket files alone)
      val (label, corpus, dim, shards) =
        if (spec.startsWith("synth:")) {
          val parts = spec.split(":")
          (spec, synth(parts(1).toInt, parts(2).toInt), 32,
            if (parts.length > 3) parts(3).toInt else 4)
        } else
          (spec, graft.sources.Tables.load(spark, spec, "embeddings"),
            64, 4)
      val cached = corpus.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = cached.count()
      val store = java.nio.file.Files.createTempDirectory("lifecost")
        .toString + "/store"
      val S = graft.operators.Similarity
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val queries = cached.filter(col("vec_id") < 16)
      def exhaustive(sh: Int): (Set[(Long, Long)], Double) = {
        val (rows, s) = time(S.searchRoutedIvfStore(spark, queries, store,
            k = 10, nprobe = 1 << 20, routeShards = sh)
          .select("query_id", "item_id").as[(Long, Long)].collect())
        (rows.toSet, s)
      }
      def brute(c: DataFrame): Set[(Long, Long)] =
        S.bruteForceTopK(c, queries, 10)
          .select("query_id", "item_id").as[(Long, Long)].collect().toSet

      val (_, buildSec) = time(S.buildRoutedIvfStore(cached, store,
        shards = shards, nlist = 0, iters = 0, dim = dim, superIters = 3))
      // a store expecting a CDC tail pre-pays its location index (the
      // same pass the first mutation would otherwise pay lazily) —
      // timed separately so the floor probe below stays PURE lookup
      val (_, ensureSec) = time((0 until shards).foreach { i =>
        val d = s"$store/shard=$i"
        if (new java.io.File(d).exists())
          graft.operators.AnnLocIndex.ensure(spark, d)
      })
      exhaustive(shards) // untimed warm-up: codegen + file listing
      val (_, searchBase) = exhaustive(shards)
      // the pure per-batch FLOOR (r14): a delete of 100 never-stored
      // ids does zero useful work — every shard must prove absence;
      // with the location index that proof is a bucket-file read per
      // shard, without it a narrow corpus scan per shard. The number
      // to watch across the :S sweep.
      val novel = (0 until 100).map(i => n + i).toDF("vec_id")
      val (_, floorSec) = time(
        S.deleteFromShardedIvfStore(spark, novel, store))
      // UPSERT cost ∝ the lists the batch touches — measured along a
      // batch-size curve: ~0.01% (tiny), ~0.1% (the CDC micro-batch
      // case the feature exists for), ~5% (bulk — the rebuild
      // crossover). Each subset divides the next (%10000 ⊂ %1000 ⊂
      // %20 for remainder 3), so later upserts re-replace the earlier
      // ids and the final state stays exactly "%20==3 reversed".
      val updTiny = cached.filter(col("vec_id") % 10000 === 3)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      val (_, upsertTinySec) = time(
        S.upsertIntoShardedIvfStore(spark, updTiny, store))
      val updSmall = cached.filter(col("vec_id") % 1000 === 3)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      val (_, upsertSmallSec) = time(
        S.upsertIntoShardedIvfStore(spark, updSmall, store))
      val smallEquiv = {
        val updatedSmall = cached.withColumn("embedding",
          when(col("vec_id") % 1000 === 3, reverse(col("embedding")))
            .otherwise(col("embedding")))
        exhaustive(shards)._1 == brute(updatedSmall)
      }
      // then a ~5% BULK replacement (reversed vectors — the CDC U
      // path: tombstone → targeted reclaim → re-file by the router);
      // the displaced rival is the same full rebuild the delete is
      // measured against. A uniformly-spread 5% batch touches nearly
      // every list, so this is targeted reclaim's WORST case — the
      // measurement that tells an operator where the rebuild crossover
      // sits.
      val upd = cached.filter(col("vec_id") % 20 === 3)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      val updated = cached.withColumn("embedding",
        when(col("vec_id") % 20 === 3, reverse(col("embedding")))
          .otherwise(col("embedding")))
      val bruteUpdated = brute(updated)
      val (_, upsertSec) = time(
        S.upsertIntoShardedIvfStore(spark, upd, store))
      val (upsRows, searchUps) = exhaustive(shards)
      val upsEquiv = upsRows == bruteUpdated
      // ~10% takedown batch (applied on the post-upsert store)
      val gone = cached.filter(col("vec_id") % 10 === 7).select("vec_id")
      val remaining = updated.filter(col("vec_id") % 10 =!= 7)
      val bruteRemaining = brute(remaining)
      val (nDel, deleteSec) = time(
        S.deleteFromShardedIvfStore(spark, gone, store))
      val (tombRows, searchTomb) = exhaustive(shards)
      val tombEquiv = tombRows == bruteRemaining
      val (_, compactSec) = time((0 until shards).foreach { i =>
        val d = s"$store/shard=$i"
        if (new java.io.File(d).exists()) S.compactIvfStore(spark, d)
      })
      val (cleanRows, searchClean) = exhaustive(shards)
      val cleanEquiv = cleanRows == bruteRemaining
      // the displaced rival: rebuild from the remaining corpus
      val store2 = java.nio.file.Files.createTempDirectory("lifecost2")
        .toString + "/store"
      val (_, rebuildSec) = time(S.buildRoutedIvfStore(remaining, store2,
        shards = shards, nlist = 0, iters = 0, dim = dim, superIters = 3))
      // merge the two coldest shards on the compacted store
      val (newSh, mergeSec) = time(S.mergeColdShards(spark, store))
      val (mergedRows, _) = exhaustive(newSh)
      val mergeEquiv = mergedRows == bruteRemaining
      cached.unpersist(blocking = false)
      println(s"""{"corpus":"$label","n":$n,"shards":$shards,""" +
        s""""n_deleted":$nDel,""" +
        f""""build_sec":$buildSec%.2f,"ensure_sec":$ensureSec%.2f,""" +
        f""""search_base_sec":$searchBase%.2f,""" +
        f""""floor_noop_sec":$floorSec%.2f,""" +
        f""""upsert_tiny_sec":$upsertTinySec%.2f,""" +
        f""""upsert_small_sec":$upsertSmallSec%.2f,""" +
        f""""upsert_sec":$upsertSec%.2f,"search_ups_sec":$searchUps%.2f,""" +
        f""""delete_sec":$deleteSec%.2f,"search_tomb_sec":$searchTomb%.2f,""" +
        f""""compact_sec":$compactSec%.2f,"search_clean_sec":$searchClean%.2f,""" +
        f""""rebuild_sec":$rebuildSec%.2f,"merge_sec":$mergeSec%.2f,""" +
        s""""shards_end":$newSh,"small_equiv":$smallEquiv,""" +
        s""""ups_equiv":$upsEquiv,""" +
        s""""tomb_equiv":$tombEquiv,""" +
        s""""clean_equiv":$cleanEquiv,"merge_equiv":$mergeEquiv}""")
    }
    spark.stop()
  }
}
