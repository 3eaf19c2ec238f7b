package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{BloomIndex, ZoneMap}

/**
 * Streaming file-index maintenance: keeps [[graft.operators.ZoneMap]]
 * and/or [[graft.operators.BloomIndex]] stats fresh over a
 * continuously-landing parquet directory — the missing link between
 * the landing sinks ([[StreamingDemux]], [[MergeSink]],
 * `StreamSplitter`) and the data-skipping scans: without it, every
 * newly-landed file trips the indexes' staleness guard (`scanRange`/
 * `scanIn` REFUSE to scan over unindexed files rather than silently
 * dropping rows), so a streaming table would go unqueryable-via-index
 * until some external job ran `append()`.
 *
 * Shape: a parquet file-source stream on the data dir is used as a
 * TICKER — its micro-batch fires exactly when new files land, but the
 * batch DataFrame itself is never evaluated (no data IO from the
 * source side). Each tick runs the indexes' own build-or-append,
 * whose FS-listing-minus-known discipline finds ALL unindexed files
 * and scans only those. Cost per tick: one metadata listing + one
 * batch-sized scan — independent of table history, the only
 * maintenance cost model that survives a 100 TB table.
 *
 * Crash/re-delivery safety needs no commit tags (unlike
 * [[RollupStream]]'s non-idempotent folds): `append()` is
 * list-minus-known idempotent, so a re-delivered tick — or a tick
 * racing a concurrent manual append — converges to the same stats
 * rows. A crash between data landing and stats append just leaves
 * files for the next tick, and the staleness guard keeps reads
 * honest in the gap.
 */
object IndexMaintainStream {

  /** Which indexes to maintain: statsDir → tracked columns. */
  final case class Indexes(
      zone: Option[(String, Seq[String])] = None,
      bloom: Option[(String, Seq[String])] = None,
      bloomExpectedItems: Long = 1000000L) {
    require(zone.nonEmpty || bloom.nonEmpty, "maintain at least one index")
  }

  /** Continuous maintenance of the indexes over `dataDir`. The data
    * dir must already hold at least one file (the file source needs a
    * schema); [[refresh]] covers the backlog on the first tick. */
  def maintain(spark: SparkSession, dataDir: String, idx: Indexes,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = spark.readStream
      .schema(spark.read.parquet(dataDir).schema)
      .parquet(dataDir)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        // the batch is deliberately unused: refresh discovers work by
        // FS listing, so coverage never depends on what this
        // particular batch happened to see
        refresh(spark, dataDir, idx)
      }
      .start()
  }

  /** One maintenance pass (factored out for direct batch/cron use):
    * build the stats table if absent, else append the unindexed
    * files. Idempotent — re-running with no new files is a no-op. */
  def refresh(spark: SparkSession, dataDir: String, idx: Indexes): Unit = {
    idx.zone.foreach { case (statsDir, cols) =>
      if (statsExist(spark, statsDir)) ZoneMap.append(spark, dataDir, statsDir, cols)
      else ZoneMap.build(spark, dataDir, statsDir, cols)
    }
    idx.bloom.foreach { case (statsDir, cols) =>
      if (statsExist(spark, statsDir))
        BloomIndex.append(spark, dataDir, statsDir, cols, idx.bloomExpectedItems)
      else BloomIndex.build(spark, dataDir, statsDir, cols, idx.bloomExpectedItems)
    }
  }

  private def statsExist(spark: SparkSession, statsDir: String): Boolean = {
    val p = new Path(statsDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
