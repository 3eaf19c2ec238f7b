package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/**
 * Query-scoped lifetime for operator-owned persists. Several operators
 * persist an intermediate because the RETURNED (lazy) plan references
 * it 2-3× — the signature/shingle/vector table feeding both an index
 * build and a verification join. The operator cannot unpersist before
 * returning (nothing has run yet), and leaving it cached leaks blocks
 * into a long-lived session (round-2/3 review finding; Bench masks it
 * with clearCache between queries, real sessions don't).
 *
 * [[releaseAfterUse]] closes the lifecycle: a one-shot
 * `QueryExecutionListener` watches for the first completed action
 * (success OR failure) whose analyzed plan contains the cached subtree
 * — i.e. the caller actually ran the query — then unpersists and
 * unregisters itself. Within that one action the cache still does its
 * job (the N references hit the block store); after it, the session
 * holds no operator-owned blocks (asserted by CacheLifecycleSpec).
 *
 * Contract: the caller runs ONE action over the returned plan (the
 * Verify/Bench/foreachBatch shape). A second action recomputes the
 * intermediate — correct, just uncached; callers wanting multi-action
 * reuse own the persist themselves. Operators that run INTERNAL
 * actions (trainCentroids/trainBooks) release with try/finally
 * instead — a listener registered before construction-time actions
 * would fire on them.
 *
 * Blind spot: the listener bus only sees Dataset-level actions. A
 * caller that abandons the returned plan, or drives it exclusively
 * through RDD-level actions (`df.rdd.foreach`, direct
 * `sparkContext.runJob`), produces no `QueryExecutionListener` event —
 * the match never fires. The `expiryEvents` fallback bounds that leak:
 * after that many post-registration events with no match, the persist
 * releases anyway (perf-only if the caller was merely slow — the plan
 * recomputes). Only a session that goes completely silent after the
 * abandonment keeps the blocks, and then nothing is contending for
 * the memory they hold.
 */
object Caches {

  /** Latest owner token per canonicalized cached plan. The listener
    * bus is ASYNCHRONOUS: when Bench rebuilds the same query for its
    * second run, construction N's not-yet-delivered event must not
    * unpersist the cache entry construction N+1 just re-created for
    * the identical canonical plan (observed as erratic 3× slowdowns:
    * the late listener killed the successor's cache mid-query). A new
    * registration SUPERSEDES the previous listener — a superseded
    * listener unregisters without touching the (now successor-owned)
    * cache entry. Registration and release synchronize on this map, so
    * a check-then-unpersist can't interleave with a new registration. */
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()

  /** Persist `df` at `level` and register the one-shot release
    * listener; returns the persisted frame for chaining.
    *
    * The persist happens HERE, after ownership registration — not in
    * the caller. With caller-side persist there was a window where a
    * predecessor's late event could observe its own token still
    * current (successor persisted, put not yet run) and unpersist the
    * entry the successor had just created. Ownership-then-persist
    * closes it: by the time the entry exists, the stale event already
    * fails the token check. Stale events delivered to the NEW listener
    * are screened by execution id: `QueryExecution` ids are assigned
    * from a monotone counter at construction, and any event whose
    * action COMPLETED before this registration ran was constructed
    * before `df`'s own QueryExecution — so `qe.id < floor` identifies
    * it exactly, and the one-action-early release race is a non-event
    * rather than a documented hazard. */
  def releaseAfterUse(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      expiryEvents: Int = 64): DataFrame = {
    // escape hatch for callers that deliberately reuse caches across
    // actions/runs and clear them session-wide themselves
    if (sys.env.contains("GRAFT_KEEP_CACHES")) return df.persist(level)
    val spark = df.sparkSession
    val target = df.queryExecution.analyzed
    // id floor: df's own QueryExecution is the oldest construction the
    // caller's action can possibly report (running the returned frame
    // reports THIS instance; wrapping it in a larger plan constructs a
    // newer one) — anything below it predates this registration
    val floor = df.queryExecution.id
    val key = (System.identityHashCode(spark), target.canonicalized)
    val token = new Object
    owners.synchronized { owners.put(key, token) }
    val cached = df.persist(level)
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private val unrelated = new java.util.concurrent.atomic.AtomicInteger
      private def release(): Unit = {
        owners.synchronized {
          if (owners.remove(key, token)) cached.unpersist(blocking = false)
        }
        spark.listenerManager.unregister(this)
      }
      private def maybe(qe: QueryExecution): Unit = {
        if (owners.get(key) ne token) {
          // a rebuilt construction took ownership of this cache entry
          if (done.compareAndSet(false, true))
            spark.listenerManager.unregister(this)
        } else if (qe.id < floor) {
          // stale: completed (and was queued) before this registration
        } else if (qe.analyzed.exists(_.sameResult(target))) {
          if (done.compareAndSet(false, true)) release()
        } else if (unrelated.incrementAndGet() >= expiryEvents &&
            done.compareAndSet(false, true)) {
          // fallback expiry: the caller abandoned the plan or drove it
          // through RDD actions the listener bus never sees — release
          // rather than leak for the session's lifetime
          release()
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybe(qe)
    }
    spark.listenerManager.register(listener)
    cached
  }
}
