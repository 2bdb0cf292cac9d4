package graft.operators

import org.apache.spark.sql.DataFrame

/** GC-scoped DataFrame cache lifetimes. A DataFrame-level persist
  * registers a plan-keyed CacheManager entry that only an explicit
  * `unpersist` on the SAME frame can drop — an operator that caches
  * an intermediate and returns a lazy result can never release it,
  * so long-lived sessions accumulate one entry per call (and
  * streaming loops one per micro-batch). [[releaseWith]] ties the
  * cache to the RESULT frame's reachability via a
  * [[java.lang.ref.Cleaner]]: when the caller drops the result, the
  * entry unpersists — the ContextCleaner contract, extended to the
  * plan cache. The cache stays a pure performance hint: a release
  * that races a late re-evaluation merely recomputes (never wrong
  * results), and the measured alternatives that avoid CacheManager
  * outright (eager localCheckpoint, RDD-level caching) ran
  * 1.5-1.8× slower whole-operator on the mining hot path at sf0.1.
  *
  * GC-scoping alone is a latency lottery on a big-heap driver (a
  * 128 GiB JVM can go hours between collections, and the stale
  * entries hold EXECUTOR block memory the whole time), so
  * [[releaseNow]] is PUBLIC: a batch caller done with an operator
  * result (`Mining.marginPairs`, `Knn.exactBatch`,
  * `Curation.curateAndPack`, …) calls
  * `CacheScope.releaseNow(result)` after its last action and the
  * scoped caches drain immediately — the Cleaner remains the safety
  * net for callers that never bother. */
object CacheScope {
  private val cleaner = java.lang.ref.Cleaner.create()
  // result -> its scoped caches, weakly keyed: lets releaseNow drop
  // them deterministically; entries vanish with the result either way
  private val pending = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, java.util.List[DataFrame]]())

  // while a [[scoped]] body runs on this thread, every releaseWith
  // registration ALSO lands here, so the composite operator can
  // rebind nested caches (an inner exactBatch's query persist, keyed
  // to an intermediate frame the caller never sees) to its final
  // result — without this, releaseNow(result) drains only the
  // outermost cache and the inner ones wait for GC anyway
  private val capturing = new ThreadLocal[java.util.ArrayList[DataFrame]]

  /** Unpersist `cached` once `result` becomes unreachable; returns
    * `result` for chaining. Operator-internal — callers release
    * through [[releaseNow]] or by dropping the result.
    *
    * Inside a [[scoped]] block the registration is DEFERRED to the
    * block's final result instead of `result`: a nested operator's
    * `result` there is an intermediate frame that goes unreachable
    * the moment the composite returns, and a Cleaner keyed on it can
    * fire DURING the composite result's first action — uncaching the
    * entry while the running plan still references its builder,
    * which then materializes a buffer RDD no CacheManager entry owns
    * (unreleasable until the ContextCleaner's own GC pass). The
    * composite's result is the real lifetime owner. */
  private[graft] def releaseWith(result: DataFrame,
      cached: DataFrame): DataFrame = {
    val cap = capturing.get()
    if (cap != null) { cap.add(cached); return result }
    cleaner.register(result, new Release(cached))
    pending.computeIfAbsent(result,
      _ => new java.util.ArrayList[DataFrame]()).add(cached)
    result
  }

  /** Register `cached` with the ENCLOSING [[scoped]] block directly —
    * for persists a composite creates BEFORE its final releaseWith
    * (a failure in between would otherwise leave them untracked:
    * neither Cleaner nor pending entry). Outside any scope this is a
    * deliberate no-op (a self-referencing Cleaner would pin the
    * frame forever); such callers must releaseWith on their result
    * as usual. Returns `cached` for chaining. */
  private[graft] def defer(cached: DataFrame): DataFrame = {
    val cap = capturing.get()
    if (cap != null) cap.add(cached)
    cached
  }

  /** Run a composite operator's body and scope every cache any
    * NESTED operator registered during it to the body's result
    * frame, so one [[releaseNow]](result) — or the result's own GC —
    * drains the whole composition. Nested scoped blocks compose: the
    * inner block's caches propagate to the OUTER block's result. */
  private[graft] def scoped(body: => DataFrame): DataFrame = {
    val prev = capturing.get()
    val mine = new java.util.ArrayList[DataFrame]()
    capturing.set(mine)
    val result =
      try body
      catch { case e: Throwable =>
        // a failed composition has no result to scope to: release
        // the nested caches NOW — deferring them silently would
        // leave persisted frames with neither a Cleaner nor a
        // pending entry, pinned for the SparkContext's lifetime
        mine.forEach { c =>
          try { c.unpersist(blocking = false); () }
          catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
      } finally capturing.set(prev)
    mine.forEach(c => releaseWith(result, c))
    result
  }

  /** Release every cache scoped to `result` NOW — for callers
    * (streaming foreachBatch bodies, long-lived batch sessions)
    * whose last action on the frame has completed and that must not
    * wait for a driver GC. The Cleaner's later run is an idempotent
    * no-op, and a `result` with no scoped caches is a no-op too. */
  def releaseNow(result: DataFrame): Unit = {
    val l = pending.remove(result)
    if (l == null) return
    // DEPENDENTS FIRST: uncaching a base plan while a dependent
    // cache entry still references it makes CacheManager RECACHE the
    // dependent (non-cascading uncache keeps it live), and under AQE
    // that recache can orphan the dependent's already-materialized
    // RDD — persistent in the SparkContext with no CacheManager
    // entry left to release it, exactly the GC-wait this hook exists
    // to avoid. Ordering by plan containment (a frame whose plan
    // contains another's is the dependent) means every entry is gone
    // before its base's uncache runs, so no recache ever fires.
    // Lists are operator-internal and tiny (≤ a handful of frames).
    val frames = {
      val seen = new java.util.IdentityHashMap[DataFrame, Boolean]()
      val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      l.forEach(c => if (seen.put(c, true) == null) out += c)
      out.toSeq
    }
    def contains(outer: DataFrame, inner: DataFrame): Boolean =
      try {
        val op = outer.queryExecution.analyzed
        val ip = inner.queryExecution.analyzed
        op.exists(n => (n ne op) && n.sameResult(ip))
      } catch { case scala.util.control.NonFatal(_) => false }
    val ordered = frames.sortBy(f =>
      -frames.count(g => (g ne f) && contains(f, g)))
    // captured BEFORE any uncache (the entries must still exist for
    // cache substitution to surface them): the materialized buffer
    // RDDs backing these frames. Whatever the uncache/recache dance
    // below leaves persistent in the SparkContext gets swept here —
    // without this, an AQE recache of a dependent entry orphans its
    // old buffer RDD until a driver GC runs the ContextCleaner.
    val buffers = ordered.flatMap { f =>
      try org.apache.spark.sql.graft.shims.loadedCacheBufferRdds(f)
      catch { case scala.util.control.NonFatal(_) => Nil }
    }
    ordered.foreach { c =>
      try { c.unpersist(blocking = false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    buffers.foreach { r =>
      try { r.unpersist(blocking = false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** The cleanup action holds ONLY the cached frame — a lambda could
    * accidentally capture the registered result and keep it reachable
    * forever. Unpersist after session stop is a no-op by design. */
  private final class Release(cached: DataFrame) extends Runnable {
    def run(): Unit =
      try { cached.unpersist(blocking = false); () }
      catch { case scala.util.control.NonFatal(_) => () }
  }
}
