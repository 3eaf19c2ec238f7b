package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Control-plane execution scope for the store MUTATION paths — the
 * CDC dispatches, deletes, upserts, reclaims and compactions whose
 * per-micro-batch cost is DRIVER ACTIONS over batch-sized frames
 * (id sets, tombstone logs, file-targeted rewrites), not data volume.
 *
 * Inside the scope, adaptive query execution is disabled: AQE's
 * architecture materializes one query STAGE at a time and re-plans
 * between stages, which is the right trade for data-plane queries
 * (runtime coalescing, skew splits, join re-selection over unknown
 * sizes) and pure per-stage latency for mutation steps, whose inputs
 * are batch-bounded BY CONSTRUCTION (a CDC micro-batch's ids, a
 * takedown-sized op log, ≤ one file per touched bucket) and whose
 * join strategies are already pinned by explicit broadcast() hints.
 * Measured on the r16 lifecycle probe (sf0.1, steady state, 2-shard
 * routed ANN store, mixed I/U/D batch): the CDC batch's ~40 driver
 * actions span ~108 scheduler jobs with AQE on (every exchange is a
 * separately materialized + re-planned stage) vs ~79 with it off —
 * wall 9.9 s → 7.7 s (b1) and 7.8 s → 6.5 s (b2). The win is
 * scale-INdependent: it is per-stage driver latency × stages per
 * micro-batch, the term that multiplies by shard count and stream
 * cadence at 100 TB, while AQE's benefits on these steps are ~nil
 * (nothing to coalesce or re-join on a batch-sized exchange).
 *
 * Scoping: the toggle is session-level (Spark has no per-action
 * conf), so entry points set it ONCE at their single-threaded entry
 * and restore on exit; the per-shard worker threads inside the scope
 * only READ the conf. Nesting is a no-op (an inner scope sees the
 * flag already off and leaves it alone), so composed mutations —
 * upsert = delete + reclaim + append — pay one toggle. Data-plane
 * work (builds, searches, audits, admission queries) runs OUTSIDE
 * the scope and keeps AQE. A concurrent data-plane query on the SAME
 * session during a mutation's scope would read the flag off — a
 * perf-only effect (AQE never changes results), and the store
 * family's single-writer maintenance-window contract already keeps
 * mutation scopes quiet.
 */
private[graft] object ControlPlane {

  private val Key = "spark.sql.adaptive.enabled"

  def apply[A](spark: SparkSession)(f: => A): A = {
    val saved = spark.conf.get(Key, "true")
    if (saved == "false") f
    else {
      spark.conf.set(Key, "false")
      try f finally spark.conf.set(Key, saved)
    }
  }

  /** Run two INDEPENDENT mutation legs concurrently — the dedup-side
    * analog of Similarity's per-shard pool, for the bands/sigs table
    * pair whose rewrites are documented order-neutral (the standing
    * tombstones hide the ids throughout; each leg reads and writes
    * only its own table). Bounded two-thread pool per call — the legs
    * BLOCK on Spark actions, so the shared fork-join default is off
    * limits (the r11 advice that shaped Similarity.perShardPar). */
  def par2[A, B](spark: SparkSession)(fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val es = java.util.concurrent.Executors.newFixedThreadPool(2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-table-leg")
        t.setDaemon(true); t
      })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(es)
    try {
      val a = Future(fa); val b = Future(fb)
      Await.result(a.zip(b),
        scala.concurrent.duration.Duration(900L, "s"))
    } finally es.shutdownNow()
  }
}
