package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/**
 * Streaming ANN-store ingest: a continuous feed of `(vec_id, embedding)`
 * rows folds into a materialized IVF store
 * ([[graft.operators.Similarity.buildIvfStore]]) micro-batch by
 * micro-batch — the embedding-side analog of [[NearDupStream]]'s
 * signature-store admission, and the continuous-ingest posture of the
 * reference pipeline (`/root/reference/README.md:63-75` lands a stream
 * before queries run) applied to similarity search: vectors become
 * searchable ([[graft.operators.Similarity.searchIvfStore]] /
 * `searchIvfStoreAdc`) as soon as their batch commits, with no rebuild
 * and no re-training — batches encode with the STORED quantizers, the
 * store's contract.
 *
 * Re-delivery safety comes from `appendToIvfStore` itself: each table
 * write anti-joins the batch against the item_ids already stored
 * (checked only in the batch's own list partitions), so a crashed and
 * re-run micro-batch appends nothing twice, and a crash between the
 * encoded and codes writes heals on the re-run.
 *
 * Long-running ingest fragments the hot lists (one file per batch per
 * touched list); `compactEvery = n` runs
 * [[graft.operators.Similarity.compactIvfStore]] after every n-th
 * batch, so read amplification stays bounded without an external
 * maintenance job. Compaction after a re-delivered batch is a no-op
 * rewrite of already-single-file lists.
 *
 * Long-running ingest ALSO outgrows the stored quantizer: batches
 * encode with the build-time centroids (the store's contract), so a
 * corpus that grows well past its build size silently loses recall —
 * the q108 finding, batch-side. `adviseEvery = n` runs
 * [[graft.operators.Similarity.ivfStoreAdvice]] after every n-th batch
 * and surfaces the result (`retrain_advised`, `compact_advised`, item
 * and list counts, imbalance) through `onAdvice`, making recall decay
 * OPERATOR-VISIBLE from inside the stream — the consumer schedules a
 * `buildIvfStore(nlist = 0, iters > 0)` rebuild into a fresh dir and
 * swaps, exactly what the advisory's own convergence cap guarantees
 * terminates. The advice scan is a narrow aggregate over the encoded
 * table (no vectors move), so a small `adviseEvery` is safe.
 */
object AnnIngestStream {

  /** What `adviseEvery` surfaces per advisory run: the
    * [[graft.operators.Similarity.ivfStoreAdvice]] row for the store
    * as of this batch's commit. `calibratedNprobe` is None until
    * [[graft.operators.Similarity.calibrateIvfStore]] has persisted an
    * operating point; `recalibrateAdvised` flips when the store
    * outgrows the measurement (2× items) or the quantizer changes —
    * the stream-side trigger to re-run calibration as maintenance.
    * `shard` is ≥ 0 for sharded-store ingest (one advisory per built
    * shard), -1 for a single store. */
  final case class StoreAdvice(batchId: Long, nItems: Long, nLists: Int,
      recommendedNlist: Int, imbalance: Double, maxFiles: Int,
      retrainAdvised: Boolean, compactAdvised: Boolean,
      calibratedNprobe: Option[Int] = None,
      recalibrateAdvised: Boolean = true, shard: Int = -1)

  /** Opt-in CLOSED LOOP for the calibration lifecycle: when an
    * advisory run flips `recalibrateAdvised` (the store has grown ≥2×
    * past the corpus the operating point was measured on, or was
    * never/stale-calibrated), the ingest re-runs
    * [[graft.operators.Similarity.calibrateIvfStore]] right there —
    * the advisory batch IS the maintenance window (`adviseEvery` is
    * the cadence gate), so a long-running ingest cannot silently
    * drift past its measured operating point: the next `nprobe = 0`
    * search consumes the re-measured depth. The calibration's price
    * (one exact scan of the store against `sampleN` broadcast
    * queries) is paid at most once per advisory batch per store/shard
    * — size `adviseEvery` so that cost amortizes over the batches
    * between advisories. `queries` is a REPRESENTATIVE query sample
    * (the recall target is measured against this distribution); it is
    * captured once at stream start, the usual foreachBatch closure
    * discipline. */
  final case class AutoRecalibrate(queries: DataFrame, k: Int,
      targetRecall: Double = 0.9, sampleN: Int = 32)

  /** Continuous ingest into a [[graft.operators.Similarity.buildIvfStore]]
    * directory store. `vecs` is a streaming DataFrame carrying `vec_id`
    * + `embedding` (the corpus vector convention). */
  def ingest(vecs: DataFrame, storeDir: String, checkpoint: String,
      compactEvery: Int = 0, adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow(),
      recalibrate: Option[AutoRecalibrate] = None): StreamingQuery = {
    val spark = vecs.sparkSession
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, storeDir, compactEvery,
          adviseEvery, onAdvice, recalibrate)
      }
      .start()
  }

  /** One micro-batch (factored out for direct batch use and
    * re-delivery tests — the streaming wrapper only adds checkpointed
    * batch ids). */
  private[streaming] def ingestBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storeDir: String, compactEvery: Int,
      adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      recalibrate: Option[AutoRecalibrate] = None): Unit = {
    if (batch.isEmpty) return
    Similarity.appendToIvfStore(spark, batch, storeDir)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      Similarity.compactIvfStore(spark, storeDir)
    if (adviseEvery > 0 && (batchId + 1) % adviseEvery == 0)
      adviseAndRecalibrate(spark, storeDir, batchId, -1, onAdvice,
        recalibrate)
  }

  /** The advisory step, with the opt-in closed loop: surface the
    * advisory; if it flips `recalibrateAdvised` and [[AutoRecalibrate]]
    * is configured, re-measure the operating point and surface the
    * POST-calibration advisory too (`recalibrateAdvised` now false,
    * `calibratedNprobe` the fresh depth) — the consumer sees the full
    * lifecycle: drift detected → recalibrated → consumed. */
  private def adviseAndRecalibrate(spark: SparkSession, dir: String,
      batchId: Long, shard: Int, onAdvice: StoreAdvice => Unit,
      recalibrate: Option[AutoRecalibrate]): Unit = {
    val adv = adviceOf(spark, dir, batchId, shard)
    onAdvice(adv)
    if (adv.recalibrateAdvised) recalibrate.foreach { rc =>
      Similarity.calibrateIvfStore(spark, dir, rc.queries, rc.k,
        rc.targetRecall, rc.sampleN)
      onAdvice(adviceOf(spark, dir, batchId, shard))
    }
  }

  private def adviceOf(spark: SparkSession, storeDir: String,
      batchId: Long, shard: Int = -1): StoreAdvice = {
    val r = Similarity.ivfStoreAdvice(spark, storeDir).head()
    StoreAdvice(batchId,
      r.getAs[Long]("n_items"), r.getAs[Int]("n_lists"),
      r.getAs[Int]("recommended_nlist"), r.getAs[Double]("imbalance"),
      r.getAs[Int]("max_files"), r.getAs[Boolean]("retrain_advised"),
      r.getAs[Boolean]("compact_advised"),
      Option(r.getAs[Any]("calibrated_nprobe"))
        .map(_.asInstanceOf[Int]),
      r.getAs[Boolean]("recalibrate_advised"), shard)
  }

  /** [[ingest]] for a SHARDED store
    * ([[graft.operators.Similarity.buildShardedIvfStore]]): each
    * micro-batch routes by the store's portable hash split and appends
    * per shard with that shard's stored quantizer — the same
    * re-delivery safety per shard. `compactEvery`/`adviseEvery` apply
    * per BUILT shard (advice fires once per shard per advisory batch,
    * `StoreAdvice.shard` saying which — per-shard quantizer outgrowth
    * and stale calibration are per-shard facts). */
  def ingestSharded(vecs: DataFrame, storeDir: String, checkpoint: String,
      compactEvery: Int = 0, adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow(),
      recalibrate: Option[AutoRecalibrate] = None): StreamingQuery = {
    val spark = vecs.sparkSession
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestShardedBatch(spark, batch, batchId, storeDir, compactEvery,
          adviseEvery, onAdvice, recalibrate)
      }
      .start()
  }

  private[streaming] def ingestShardedBatch(spark: SparkSession,
      batch: DataFrame, batchId: Long, storeDir: String,
      compactEvery: Int, adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      recalibrate: Option[AutoRecalibrate] = None): Unit = {
    if (batch.isEmpty) return
    Similarity.appendToShardedIvfStore(spark, batch, storeDir)
    shardMaintenance(spark, batchId, storeDir, compactEvery, adviseEvery,
      onAdvice, recalibrate)
  }

  /** The per-built-shard compact/advise/recalibrate loop — shared by
    * the hash-sharded and routed ingest bodies (shard dirs are
    * ordinary stores in both layouts). */
  private def shardMaintenance(spark: SparkSession, batchId: Long,
      storeDir: String, compactEvery: Int, adviseEvery: Int,
      onAdvice: StoreAdvice => Unit,
      recalibrate: Option[AutoRecalibrate]): Unit = {
    val maintain = (compactEvery > 0 && (batchId + 1) % compactEvery == 0) ||
      (adviseEvery > 0 && (batchId + 1) % adviseEvery == 0)
    if (maintain) Similarity.builtShardDirs(spark, storeDir).foreach {
      case (i, dir) =>
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          Similarity.compactIvfStore(spark, dir)
        if (adviseEvery > 0 && (batchId + 1) % adviseEvery == 0)
          // per-shard closed loop: each shard recalibrates against its
          // OWN grown contents (per-shard operating points are what
          // the sharded searches' nprobe=0 consumes)
          adviseAndRecalibrate(spark, dir, batchId, i, onAdvice,
            recalibrate)
    }
  }

  /** What the routed ingest surfaces per advisory batch about the
    * ROUTING layer (the per-shard [[StoreAdvice]]s cover the list
    * layer): store size, the persisted route depth and its
    * probed-shard share (None when never calibrated or calibrated
    * against a different super-quantizer), the growth-based
    * recalibration flag, and the skew pair (max/mean stored count +
    * the split advisory). `splitAdvised` is surfaced, never acted on:
    * [[graft.operators.Similarity.splitHotShard]] re-keys the router
    * — a maintenance-window decision like a rebuild, not something a
    * micro-batch should do mid-stream. */
  final case class RoutingAdvice(batchId: Long, nItems: Long,
      nShards: Int, routeShards: Option[Int], routedShare: Option[Double],
      recalibrateAdvised: Boolean, shardImbalance: Double,
      splitAdvised: Boolean, mergeAdvised: Boolean = false,
      coldShards: Seq[Int] = Seq.empty)

  /** [[ingestSharded]] for a ROUTED store
    * ([[graft.operators.Similarity.buildRoutedIvfStore]]): batches
    * route by the STORED super-quantizer
    * ([[graft.operators.Similarity.appendToRoutedIvfStore]] — the hash
    * append refuses routed stores, and vice versa), the per-shard
    * maintenance loop is identical, and the advisory batch ALSO checks
    * the ROUTING layer: [[graft.operators.Similarity.routedStoreAdvice]]
    * surfaces through `onRoutingAdvice`, and with [[AutoRecalibrate]]
    * configured a flipped `recalibrateAdvised` re-runs
    * [[graft.operators.Similarity.calibrateRoutedIvfStore]] in the
    * same window — so a long-running routed ingest keeps BOTH measured
    * operating points (per-shard nprobe AND route depth) from
    * drifting, and `routeShards = 0` searches stay honest. */
  def ingestRouted(vecs: DataFrame, storeDir: String, checkpoint: String,
      compactEvery: Int = 0, adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      onRoutingAdvice: RoutingAdvice => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow(),
      recalibrate: Option[AutoRecalibrate] = None): StreamingQuery = {
    val spark = vecs.sparkSession
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestRoutedBatch(spark, batch, batchId, storeDir, compactEvery,
          adviseEvery, onAdvice, onRoutingAdvice, recalibrate)
      }
      .start()
  }

  private[streaming] def ingestRoutedBatch(spark: SparkSession,
      batch: DataFrame, batchId: Long, storeDir: String,
      compactEvery: Int, adviseEvery: Int = 0,
      onAdvice: StoreAdvice => Unit = _ => (),
      onRoutingAdvice: RoutingAdvice => Unit = _ => (),
      recalibrate: Option[AutoRecalibrate] = None): Unit = {
    if (batch.isEmpty) return
    Similarity.appendToRoutedIvfStore(spark, batch, storeDir)
    shardMaintenance(spark, batchId, storeDir, compactEvery, adviseEvery,
      onAdvice, recalibrate)
    if (adviseEvery > 0 && (batchId + 1) % adviseEvery == 0) {
      val adv = routingAdviceOf(spark, storeDir, batchId)
      onRoutingAdvice(adv)
      if (adv.recalibrateAdvised) recalibrate.foreach { rc =>
        Similarity.calibrateRoutedIvfStore(spark, storeDir, rc.queries,
          rc.k, rc.targetRecall, rc.sampleN)
        onRoutingAdvice(routingAdviceOf(spark, storeDir, batchId))
      }
    }
  }

  private def routingAdviceOf(spark: SparkSession, storeDir: String,
      batchId: Long): RoutingAdvice = {
    val r = Similarity.routedStoreAdvice(spark, storeDir).head()
    RoutingAdvice(batchId, r.getAs[Long]("n_items"), r.getAs[Int]("n_shards"),
      Option(r.getAs[Any]("route_shards")).map(_.asInstanceOf[Int]),
      Option(r.getAs[Any]("routed_share")).map(_.asInstanceOf[Double]),
      r.getAs[Boolean]("recalibrate_advised"),
      r.getAs[Double]("shard_imbalance"),
      r.getAs[Boolean]("split_advised"),
      // surfaced like the split advisory, never auto-run — a merge
      // re-keys the router, maintenance-window work
      r.getAs[Boolean]("merge_advised"),
      r.getSeq[Int](r.fieldIndex("cold_shards")))
  }

  /**
   * Bridge from the reference pipeline's CDC envelope stream to
   * [[ingestCdc]]'s event rows: takes [[StreamingDemux.parseEnvelopes]]
   * output (late-bound `data` JSON + metadata + event_ts), keeps this
   * `table`'s DATA records (control records and other tables drop),
   * parses the payload to (vec_id, embedding), and maps the envelope
   * operations — `load`/`insert` → I, `update` → U, `delete` → D; any
   * other operation value passes through verbatim so
   * [[graft.operators.Similarity.applyCdcBatch]]'s op gate rejects it
   * LOUDLY by name instead of this layer silently dropping data. `seq`
   * is the envelope's microsecond timestamp — the transport's per-key
   * order (the same per-key contract the demux sinks rely on), so
   * latest-op-per-id resolution inside a micro-batch follows source
   * time. With this, the reference's envelope stream maintains a
   * SEARCHABLE vector store end to end: land → demux → applyCdcBatch,
   * takedowns and replacements included.
   */
  /** The payload schema [[cdcEventsFromEnvelopes]] late-binds. */
  private def laneSchema(idField: String, vecField: String) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(idField, LongType),
      StructField(vecField, ArrayType(FloatType))))
  }

  /** TRUE for this lane's DATA-record envelopes whose payload cannot
    * legally enter the store: a null id (any op — the rows
    * [[cdcEventsFromEnvelopes]] refuses by `raise_error`), or a null
    * BODY on a non-delete (the rows
    * [[graft.operators.Similarity.applyCdcBatch]]'s body gate refuses
    * — delete payloads may carry the id alone, but a partial-payload
    * insert/update has nothing to store). The raises are the right
    * guard for a direct caller (fail by name, never file a phantom or
    * degrade an update into a delete), but inside a continuous
    * pipeline one malformed payload would fail the micro-batch
    * deterministically on EVERY retry and wedge all lanes, snapshots
    * included — so [[IngestPipeline]] pre-filters on this predicate
    * into its quarantine sink (repair-and-replay, the same posture as
    * the envelope contract checks). Kept next to the bridge so flag
    * and raise can never drift on what "malformed" means. */
  def malformedPayload(table: String = "embeddings",
      idField: String = "vec_id",
      vecField: String = "embedding"): org.apache.spark.sql.Column = {
    val d = from_json(col("data"), laneSchema(idField, vecField))
    val E = graft.model.DmsEnvelope
    // unknown/null operations count too: the bridge passes them
    // through verbatim so the core's op gate can refuse them BY NAME
    // — correct for a direct caller, a deterministic wedge in-stream
    val knownOp = coalesce(col("metadata.operation").isin(
      E.OpLoad, E.OpInsert, E.OpUpdate, E.OpDelete), lit(false))
    col("metadata.`table-name`") === table &&
      col("metadata.`record-type`") === E.RecordTypeData &&
      (!knownOp || d.getField(idField).isNull ||
        (col("metadata.operation") =!= E.OpDelete &&
          d.getField(vecField).isNull))
  }

  def cdcEventsFromEnvelopes(envelopes: DataFrame,
      table: String = "embeddings", idField: String = "vec_id",
      vecField: String = "embedding"): DataFrame = {
    val dataSchema = laneSchema(idField, vecField)
    envelopes
      .filter(col("metadata.`table-name`") === table &&
        col("metadata.`record-type`") ===
          graft.model.DmsEnvelope.RecordTypeData)
      .select(from_json(col("data"), dataSchema).as("d"),
        col("data"),
        col("metadata.operation").as("operation"), col("event_ts"))
      // the id guard, symmetric to the op gate below: `from_json`
      // returns null on a corrupt payload, and a null id would sail
      // into applyCdcBatch's lanes as a phantom row (only the op
      // column is validated there) — fail by name instead. Null
      // EMBEDDING passes here only for DELETE payloads (id alone);
      // applyCdcBatch's body gate refuses it on I/U, and pipelines
      // quarantine such rows upstream via [[malformedPayload]].
      .select(
        when(col(s"d.$idField").isNull,
          raise_error(concat(
            lit(s"cdcEventsFromEnvelopes: data record for table " +
              s"'$table' parsed to a null $idField — malformed " +
              "payload: "), col("data"))))
          .otherwise(col(s"d.$idField")).as("vec_id"),
        col(s"d.$vecField").as("embedding"),
        when(col("operation").isin(graft.model.DmsEnvelope.OpLoad,
            graft.model.DmsEnvelope.OpInsert), lit("I"))
          .when(col("operation") === graft.model.DmsEnvelope.OpUpdate,
            lit("U"))
          .when(col("operation") === graft.model.DmsEnvelope.OpDelete,
            lit("D"))
          .otherwise(col("operation")).as("op"),
        unix_micros(col("event_ts")).as("seq"))
  }

  /**
   * CDC-op-aware ingest — the lifecycle loop CLOSED FROM INSIDE THE
   * STREAM: `events` carries `(vec_id, embedding, op, seq)` rows (the
   * CDC envelope convention the demux pipeline lands, op ∈ I/U/D) and
   * each micro-batch applies
   * [[graft.operators.Similarity.applyCdcBatch]] — inserts append
   * (takedown wins over a late re-delivered I), updates REPLACE
   * (tombstone → targeted reclaim → re-file by the store's current
   * assignment), deletes tombstone. Until now the stream could only
   * grow a store ([[ingest]]/[[ingestSharded]]/[[ingestRouted]]);
   * takedowns and upstream row updates — routine in a training-data
   * pipeline — had to be applied out-of-band. Works against any store
   * layout (single dir, hash-sharded, routed — detected from the
   * store, like the batch core), with the same per-shard maintenance
   * loop and, on routed stores, the same routing advisory + opt-in
   * auto-recalibration as [[ingestRouted]].
   *
   * Replay safety: a restarted, uncommitted micro-batch re-applies to
   * the same store state (D and I converge via the tombstone/id
   * anti-joins, U re-replaces with the same vector — see
   * `applyCdcBatch`). `compactEvery` here ALSO bounds the op-log's
   * churn growth: every U appends a D and an R record, and compaction
   * clears the log along with the physical reclaim.
   *
   * `onBatch` surfaces the per-batch (inserted, updated, deleted)
   * dispatch counts — the stream-side audit a takedown pipeline wants.
   */
  def ingestCdc(events: DataFrame, storeDir: String, checkpoint: String,
      compactEvery: Int = 0, adviseEvery: Int = 0,
      onBatch: (Long, (Long, Long, Long)) => Unit = (_, _) => (),
      onAdvice: StoreAdvice => Unit = _ => (),
      onRoutingAdvice: RoutingAdvice => Unit = _ => (),
      trigger: Trigger = Trigger.AvailableNow(),
      recalibrate: Option[AutoRecalibrate] = None): StreamingQuery = {
    val spark = events.sparkSession
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestCdcBatch(spark, batch, batchId, storeDir, compactEvery,
          adviseEvery, onBatch, onAdvice, onRoutingAdvice, recalibrate)
      }
      .start()
  }

  private[streaming] def ingestCdcBatch(spark: SparkSession,
      batch: DataFrame, batchId: Long, storeDir: String,
      compactEvery: Int, adviseEvery: Int = 0,
      onBatch: (Long, (Long, Long, Long)) => Unit = (_, _) => (),
      onAdvice: StoreAdvice => Unit = _ => (),
      onRoutingAdvice: RoutingAdvice => Unit = _ => (),
      recalibrate: Option[AutoRecalibrate] = None): Unit = {
    if (batch.isEmpty) return
    onBatch(batchId, Similarity.applyCdcBatch(spark, batch, storeDir))
    val sharded = {
      val p = new org.apache.hadoop.fs.Path(storeDir + "/sharding")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    if (sharded) {
      shardMaintenance(spark, batchId, storeDir, compactEvery,
        adviseEvery, onAdvice, recalibrate)
      if (Similarity.isRoutedStore(spark, storeDir) &&
          adviseEvery > 0 && (batchId + 1) % adviseEvery == 0) {
        val adv = routingAdviceOf(spark, storeDir, batchId)
        onRoutingAdvice(adv)
        if (adv.recalibrateAdvised) recalibrate.foreach { rc =>
          Similarity.calibrateRoutedIvfStore(spark, storeDir, rc.queries,
            rc.k, rc.targetRecall, rc.sampleN)
          onRoutingAdvice(routingAdviceOf(spark, storeDir, batchId))
        }
      }
    } else {
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        Similarity.compactIvfStore(spark, storeDir)
      if (adviseEvery > 0 && (batchId + 1) % adviseEvery == 0)
        adviseAndRecalibrate(spark, storeDir, batchId, -1, onAdvice,
          recalibrate)
    }
  }
}
