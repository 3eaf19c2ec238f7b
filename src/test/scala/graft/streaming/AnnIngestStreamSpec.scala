package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

/** Streamed vectors must become searchable exactly once each (the
  * append's anti join absorbs re-delivery), and periodic compaction
  * must keep hot lists single-file without changing search results. */
class AnnIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  lazy val emb = Tables.load(spark, sf0001, "embeddings")

  test("streamed batches fold into the store; re-delivered batch changes nothing; compaction keeps lists single-file") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("annstream") + "/store"
    // store built from a third of the corpus; the rest arrives as a stream
    Similarity.buildIvfStore(emb.filter(col("vec_id") % 3 === 0), dir,
      nlist = 8, m = 4, ksub = 8, dim = 64)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (day1, day2) = rest.splitAt(rest.size / 2)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnIngestStream.ingest(
      mem.toDF().toDF("vec_id", "embedding"), dir,
      checkpoint = tmp("annstream-ckpt"), compactEvery = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(day1: _*)
    q.processAllAvailable()
    mem.addData(day2: _*)
    q.processAllAvailable()
    q.stop()
    // every corpus vector is in the store exactly once, codes included
    Seq("encoded", "codes").foreach { t =>
      val ids = spark.read.parquet(s"$dir/$t").select("item_id")
        .as[Long].collect().toSeq
      assert(ids.size === ids.distinct.size, s"duplicates in $t")
      assert(ids.toSet === emb.select("vec_id").as[Long].collect().toSet, t)
    }
    // batch 2 (id 1) triggered compaction: every list is one file
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("encoded", "codes").foreach { t =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$t"))
        .filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("list_id=")).foreach { d =>
          val n = fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))
          assert(n === 1, s"$t/${d.getPath.getName} has $n files")
        }
    }
    // re-delivery: re-running a batch directly appends nothing
    val before = spark.read.parquet(s"$dir/encoded").count()
    AnnIngestStream.ingestBatch(spark,
      day1.toDF("vec_id", "embedding"), 0L, dir, compactEvery = 0)
    assert(spark.read.parquet(s"$dir/encoded").count() === before)
    // streaming ingest ≡ the batch append path: a store built from the
    // SAME seed subset (identical md5-picked quantizers) and grown with
    // one direct appendToIvfStore call must search identically
    val batchGrown = tmp("annstream-batch") + "/store"
    Similarity.buildIvfStore(emb.filter(col("vec_id") % 3 === 0), batchGrown,
      nlist = 8, m = 4, ksub = 8, dim = 64)
    Similarity.appendToIvfStore(spark,
      emb.filter(col("vec_id") % 3 =!= 0), batchGrown)
    val queries = emb.filter(col("vec_id") < 3)
    val grown = Similarity.searchIvfStoreAdc(spark, queries, dir, k = 5, nprobe = 3)
      .as[(Long, Long, Double, Double, Int)].collect().toSet
    val oneShot = Similarity.searchIvfStoreAdc(spark, queries, batchGrown, k = 5, nprobe = 3)
      .as[(Long, Long, Double, Double, Int)].collect().toSet
    assert(grown === oneShot)
  }

  test("adviseEvery surfaces retrain_advised from inside the ingest once the store outgrows its quantizer") {
    val dir = tmp("annadvise") + "/store"
    val rnd = new scala.util.Random(47)
    def vecs(from: Int, until: Int) = (from until until)
      .map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    // adaptive build at N=100 → nlist = 10; healthy store, no advice
    Similarity.buildIvfStore(vecs(0, 100), dir, nlist = 0, dim = 16)
    val seen = scala.collection.mutable.ArrayBuffer.empty[AnnIngestStream.StoreAdvice]
    // five 200-vector batches under the STORED quantizer: after them
    // the corpus sits at 1100 items — √N wants 34 lists vs the built
    // 10 (≥ 2×, i.e. ≥ 4× growth) — and the advisory must have flipped
    (0 until 5).foreach { b =>
      AnnIngestStream.ingestBatch(spark, vecs(100 + b * 200, 100 + (b + 1) * 200),
        b.toLong, dir, compactEvery = 0, adviseEvery = 1, onAdvice = seen += _)
    }
    assert(seen.size === 5)
    assert(seen.map(_.nItems).toSeq === Seq(300L, 500L, 700L, 900L, 1100L))
    assert(seen.forall(_.nLists == 10))
    // the flip point: recommended_nlist crosses 2× built nlist at 400
    // items — every advisory from batch 1 on flags the retrain
    assert(!seen.head.retrainAdvised, seen.head.toString)
    assert(seen.tail.forall(_.retrainAdvised), seen.toSeq.toString)
    assert(seen.last.recommendedNlist === 34)
    // acting on the advice converges: an adaptive rebuild of the grown
    // corpus satisfies the advisor that triggered it
    val rebuilt = tmp("annadvise-rebuilt") + "/store"
    // the encoded table keeps unit vectors — normalizing is idempotent,
    // and the advisory only counts items and lists
    Similarity.buildIvfStore(spark.read.parquet(s"$dir/encoded")
        .select(col("item_id").as("vec_id"), col("item_vec").as("embedding")),
      rebuilt, nlist = 0, dim = 16)
    val after = Similarity.ivfStoreAdvice(spark, rebuilt)
      .select("retrain_advised").as[Boolean].head()
    assert(!after, "adaptive rebuild must clear retrain_advised")
  }

  test("auto-recalibration closes the loop: drift flips the flag, the ingest re-measures, nprobe=0 consumes the new depth") {
    val dir = tmp("annrecal") + "/store"
    // store built and calibrated on a third of the corpus
    Similarity.buildIvfStore(emb.filter(col("vec_id") % 3 === 0), dir,
      nlist = 8, dim = 64)
    val queries = emb.filter(col("vec_id") < 10)
    Similarity.calibrateIvfStore(spark, dir, queries, k = 5,
      targetRecall = 1.0)
    val calItems0 = spark.read.parquet(dir + "/calibration")
      .collect().head.getAs[Long]("n_items")
    val advices = scala.collection.mutable.ArrayBuffer
      .empty[AnnIngestStream.StoreAdvice]
    // one advisory batch grows the store ~3x past the measured corpus
    // with the closed loop ON
    AnnIngestStream.ingestBatch(spark,
      emb.filter(col("vec_id") % 3 =!= 0).select("vec_id", "embedding"),
      0L, dir, compactEvery = 0, adviseEvery = 1,
      onAdvice = advices += _,
      recalibrate = Some(AnnIngestStream.AutoRecalibrate(queries, k = 5,
        targetRecall = 1.0)))
    // the full lifecycle is surfaced: drift detected, then consumed
    assert(advices.size === 2, advices.toString)
    assert(advices(0).recalibrateAdvised,
      "pre-advice must flag the drift (3x past the measured corpus)")
    assert(!advices(1).recalibrateAdvised,
      "post-advice must show the recalibration consumed")
    assert(advices(1).calibratedNprobe.isDefined)
    // the persisted operating point was re-measured against the GROWN
    // store, not the build-time corpus
    val cal = spark.read.parquet(dir + "/calibration").collect().head
    assert(cal.getAs[Long]("n_items") === emb.count())
    assert(cal.getAs[Long]("n_items") > calItems0)
    // nprobe=0 searches consume the fresh depth: target 1.0 ⇒ exact,
    // and identical to passing the re-measured depth explicitly
    val got = Similarity.searchIvfStore(spark, queries, dir, k = 5,
        nprobe = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
    val explicit = Similarity.searchIvfStore(spark, queries, dir, k = 5,
        nprobe = cal.getAs[Int]("nprobe"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === explicit)
    // a healthy store does NOT re-pay the calibration: the next
    // advisory batch emits exactly one advice (no drift, no re-run)
    advices.clear()
    AnnIngestStream.ingestBatch(spark,
      emb.filter(col("vec_id") < 3).select("vec_id", "embedding"),
      1L, dir, compactEvery = 0, adviseEvery = 1,
      onAdvice = advices += _,
      recalibrate = Some(AnnIngestStream.AutoRecalibrate(queries, k = 5,
        targetRecall = 1.0)))
    assert(advices.size === 1)
    assert(!advices(0).recalibrateAdvised)
  }

  test("routed ingest: batches route by the stored super-quantizer; both calibration loops close") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("annrouted") + "/store"
    Similarity.buildRoutedIvfStore(emb.filter(col("vec_id") % 3 === 0),
      dir, shards = 3, nlist = 4, dim = 64)
    val queries = emb.filter(col("vec_id") < 10)
    Similarity.calibrateRoutedIvfStore(spark, dir, queries, k = 5,
      targetRecall = 1.0)
    val items0 = spark.read.parquet(dir + "/routing")
      .collect().head.getAs[Long]("n_items")
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val radvices = scala.collection.mutable.ArrayBuffer
      .empty[AnnIngestStream.RoutingAdvice]
    val advices = scala.collection.mutable.ArrayBuffer
      .empty[AnnIngestStream.StoreAdvice]
    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnIngestStream.ingestRouted(
      mem.toDF().toDF("vec_id", "embedding"), dir,
      checkpoint = tmp("annrouted-ckpt"), compactEvery = 0,
      adviseEvery = 1, onAdvice = advices += _,
      onRoutingAdvice = radvices += _,
      recalibrate = Some(AnnIngestStream.AutoRecalibrate(queries, k = 5,
        targetRecall = 1.0)),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(rest: _*)
    q.processAllAvailable()
    q.stop()
    // every vector landed in exactly one shard, exactly once
    val ids = (0 until 3).map(i =>
        spark.read.parquet(s"$dir/shard=$i/encoded").select("item_id"))
      .reduce(_ unionByName _).as[Long].collect().toSeq
    assert(ids.size === ids.distinct.size)
    assert(ids.toSet === emb.select("vec_id").as[Long].collect().toSet)
    // ROUTING loop lifecycle: the ~3x growth flips the flag, the
    // ingest re-measures, the post-advisory shows it consumed
    assert(radvices.exists(_.recalibrateAdvised))
    assert(!radvices.last.recalibrateAdvised)
    assert(radvices.last.routeShards.isDefined)
    val routing = spark.read.parquet(dir + "/routing").collect().head
    assert(routing.getAs[Long]("n_items") === emb.count())
    assert(routing.getAs[Long]("n_items") > items0)
    // per-SHARD loop closed too (shards were never nprobe-calibrated
    // at build: the stream did it at target 1.0 against grown
    // contents), so the all-knobs-derived search is EXACT
    assert(advices.nonEmpty)
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 0, routeShards = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
    // a hash-sharded ingest pointed at this routed store refuses loudly
    val e = intercept[IllegalArgumentException] {
      AnnIngestStream.ingestShardedBatch(spark,
        rest.take(2).toDF("vec_id", "embedding"), 0L, dir,
        compactEvery = 0)
    }
    assert(e.getMessage.contains("ROUTED"))
  }

  test("sharded ingest: batches route by hash, search stays exact, per-shard advisories carry calibration state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("annshard") + "/store"
    Similarity.buildShardedIvfStore(emb.filter(col("vec_id") % 3 === 0),
      dir, shards = 3, nlist = 4, dim = 64)
    // calibrate the seeded store at target 1.0 so the stream's nprobe=0
    // searches stay exhaustive-exact while it grows
    Similarity.calibrateShardedIvfStore(spark, dir,
      emb.filter(col("vec_id") < 10), k = 5, targetRecall = 1.0)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (day1, day2) = rest.splitAt(rest.size / 2)
    val advices = scala.collection.mutable.ArrayBuffer
      .empty[AnnIngestStream.StoreAdvice]
    val mem = MemoryStream[(Long, Array[Float])]
    val q = AnnIngestStream.ingestSharded(
      mem.toDF().toDF("vec_id", "embedding"), dir,
      checkpoint = tmp("annshard-ckpt"), compactEvery = 2,
      adviseEvery = 2, onAdvice = advices += _,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(day1: _*)
    q.processAllAvailable()
    mem.addData(day2: _*)
    q.processAllAvailable()
    q.stop()
    // every vector in exactly one shard, exactly once
    val ids = (0 until 3).map(i =>
        spark.read.parquet(s"$dir/shard=$i/encoded").select("item_id"))
      .reduce(_ unionByName _).as[Long].collect().toSeq
    assert(ids.size === ids.distinct.size)
    assert(ids.toSet === emb.select("vec_id").as[Long].collect().toSet)
    // batch 2 compacted every shard: single-file lists everywhere
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { i =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/shard=$i/encoded"))
        .filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("list_id=")).foreach { d =>
          assert(fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet")) === 1,
            s"shard $i ${d.getPath.getName}")
        }
    }
    // advisory fired once per built shard at batch 2, carrying the
    // calibration columns: calibrated at target 1.0, then grown ~3x
    // past the measured corpus → recalibrate_advised
    assert(advices.map(_.shard).toSet === Set(0, 1, 2))
    assert(advices.forall(_.calibratedNprobe.isDefined))
    assert(advices.forall(_.recalibrateAdvised))
    // re-delivery: a re-run batch appends nothing anywhere
    val before = ids.size
    AnnIngestStream.ingestShardedBatch(spark,
      day1.toDF("vec_id", "embedding"), 0L, dir, compactEvery = 0)
    val after = (0 until 3).map(i =>
      spark.read.parquet(s"$dir/shard=$i/encoded").count()).sum
    assert(after === before.toLong)
    // streamed-grown sharded store searches exactly (nprobe=4 =
    // exhaustive per shard) — equals brute force over the full corpus
    val queries = emb.filter(col("vec_id") < 3)
    val got = Similarity.searchShardedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === exact)
  }

  test("CDC ingest: streamed I/U/D batches close the lifecycle loop — replacements re-file, takedowns exclude, compaction folds in, replay converges") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("anncdc") + "/store"
    Similarity.buildRoutedIvfStore(emb.filter(col("vec_id") % 5 =!= 4),
      dir, shards = 2, nlist = 4, dim = 64)
    def rows(df: org.apache.spark.sql.DataFrame, op: String, seq: Long,
        rev: Boolean = false) =
      df.select(col("vec_id"),
          (if (rev) reverse(col("embedding")) else col("embedding"))
            .as("embedding"))
        .as[(Long, Array[Float])].collect()
        .map { case (id, v) => (id, v, op, seq) }.toSeq
    val b1 = rows(emb.filter(col("vec_id") % 5 === 4), "I", 1L) ++
      rows(emb.filter(col("vec_id") % 9 === 2), "U", 2L, rev = true) ++
      rows(emb.filter(col("vec_id") % 7 === 1), "D", 3L)
    val b2 = rows(emb.filter(col("vec_id") % 7 === 1 &&
        col("vec_id") % 3 === 0), "U", 10L) ++
      rows(emb.filter(col("vec_id") % 13 === 6), "D", 11L)
    val counts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (Long, Long, Long))]
    val mem = MemoryStream[(Long, Array[Float], String, Long)]
    // compactEvery = 2: the second batch ALSO physically reclaims and
    // clears the op log — the takedowns must stay excluded through it
    val q = AnnIngestStream.ingestCdc(
      mem.toDF().toDF("vec_id", "embedding", "op", "seq"), dir,
      checkpoint = tmp("anncdc-ckpt"), compactEvery = 2,
      onBatch = (id, c) => counts += ((id, c)),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    assert(counts.size === 2)
    assert(counts.head._2._1 > 0 && counts.head._2._2 > 0 &&
      counts.head._2._3 > 0, "batch 1 dispatched all three lanes")
    // the net state, replayed as a plain DataFrame: batch-2's revival
    // (%7==1 && %3==0, original vector) supersedes both batch-1's
    // delete and (where overlapping) the reversal; batch-2's deletes
    // win over everything; %9==2 otherwise carries the replacement
    val net = emb
      .filter(col("vec_id") % 13 =!= 6 &&
        (col("vec_id") % 7 =!= 1 || col("vec_id") % 3 === 0))
      .withColumn("embedding",
        when(col("vec_id") % 7 === 1 && col("vec_id") % 3 === 0,
          col("embedding"))
        .when(col("vec_id") % 9 === 2, reverse(col("embedding")))
        .otherwise(col("embedding")))
    val queries = emb.filter(col("vec_id") < 3)
    val truth = Similarity.bruteForceTopK(net, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    def got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4, routeShards = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === truth)
    // post-compaction: no op log stands, no tombstoned row lingers
    (0 until 2).foreach { i =>
      assert(!new java.io.File(s"$dir/shard=$i/deleted").exists(),
        s"shard $i op log survived the in-stream compaction")
    }
    // replaying the LAST batch (a restarted, uncommitted foreachBatch)
    // converges to the same store state
    AnnIngestStream.ingestCdcBatch(spark,
      b2.toDF("vec_id", "embedding", "op", "seq"), 1L, dir,
      compactEvery = 2)
    assert(got === truth)
    // membership is single everywhere after replacements moved shards
    val ids = (0 until 2).flatMap { i =>
      spark.read.parquet(s"$dir/shard=$i/encoded")
        .select("item_id").as[Long].collect()
    }
    assert(ids.size === ids.distinct.size)
  }

  test("reference envelope stream maintains the vector store end to end: raw CDC lines → demux parse → op mapping → searchable store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("annenv") + "/store"
    Similarity.buildRoutedIvfStore(emb.filter(col("vec_id") % 5 =!= 4),
      dir, shards = 2, nlist = 4, dim = 64)
    def vecsOf(df: org.apache.spark.sql.DataFrame, rev: Boolean) =
      df.select(col("vec_id"),
          (if (rev) reverse(col("embedding")) else col("embedding"))
            .as("embedding"))
        .as[(Long, Array[Float])].collect()
    def envLine(id: Long, v: Array[Float], op: String, us: Int,
        table: String = "embeddings", rt: String = "data"): String =
      s"""{"data": {"vec_id": $id, "embedding": [${v.mkString(",")}]}, """ +
        s""""metadata": {"timestamp": "2019-11-13T10:00:00.${f"$us%06d"}Z", """ +
        s""""record-type": "$rt", "operation": "$op", """ +
        s""""partition-key-type": "primary-key", "schema-name": "dms_sample", """ +
        s""""table-name": "$table"}}"""
    // inserts (load AND insert spellings), updates (reversed vectors),
    // deletes — per-id order carried by the envelope timestamp; plus a
    // control record and an other-table record that must drop silently
    val lines =
      vecsOf(emb.filter(col("vec_id") % 5 === 4 &&
        col("vec_id") % 2 === 0), rev = false)
        .map { case (id, v) => envLine(id, v, "load", 1) } ++
      vecsOf(emb.filter(col("vec_id") % 5 === 4 &&
        col("vec_id") % 2 =!= 0), rev = false)
        .map { case (id, v) => envLine(id, v, "insert", 1) } ++
      vecsOf(emb.filter(col("vec_id") % 9 === 2), rev = true)
        .map { case (id, v) => envLine(id, v, "update", 2) } ++
      vecsOf(emb.filter(col("vec_id") % 7 === 1), rev = false)
        .map { case (id, v) => envLine(id, v, "delete", 3) } ++
      Seq(
        envLine(9999L, Array(1f), "insert", 4, rt = "control"),
        envLine(9998L, Array(1f), "insert", 4, table = "person"))
    val mem = MemoryStream[String]
    val q = AnnIngestStream.ingestCdc(
      AnnIngestStream.cdcEventsFromEnvelopes(
        StreamingDemux.parseEnvelopes(mem.toDF())),
      dir, checkpoint = tmp("annenv-ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    mem.addData(lines: _*)
    q.processAllAvailable()
    q.stop()
    val net = emb
      .filter(col("vec_id") % 7 =!= 1)
      .withColumn("embedding", when(col("vec_id") % 9 === 2,
        reverse(col("embedding"))).otherwise(col("embedding")))
    val queries = emb.filter(col("vec_id") < 3)
    val got = Similarity.searchRoutedIvfStore(spark, queries, dir,
        k = 5, nprobe = 4, routeShards = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got === Similarity.bruteForceTopK(net, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().toSet)
    // the control and other-table records never reached the store
    val ids = (0 until 2).flatMap { i =>
      spark.read.parquet(s"$dir/shard=$i/encoded")
        .select("item_id").as[Long].collect()
    }
    assert(!ids.contains(9999L) && !ids.contains(9998L))
  }
}
