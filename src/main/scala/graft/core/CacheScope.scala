package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Releasable cache lifecycle for operators that `persist()` intermediates.
  *
  * The dedup/ANN families cache shingle/band/candidate tables because they
  * feed multiple downstream joins. Left unmanaged, those caches outlive the
  * call and accumulate across jobs in a long-lived session (Orchestrator /
  * BatchRunner run MANY jobs in one session; each curated job would leak
  * its intermediates until eviction pressure or OOM). This registry makes
  * every such cache releasable:
  *
  *  - Operators call [[CacheScope.persist]] instead of `df.persist()`.
  *  - Callers that own a terminal action wrap build+action in
  *    [[CacheScope.scoped]]; every intermediate persisted inside the block
  *    is unpersisted when the block exits. Frames BUILT inside a scope must
  *    not be re-executed after it closes (they would silently recompute).
  *  - Library users who call operators bare (no scope) can release
  *    everything accumulated so far with [[CacheScope.releaseAll]].
  *
  * Scopes are thread-local, so BatchRunner's concurrent jobs each release
  * only their own intermediates. Unpersists are blocking for deterministic
  * `getPersistentRDDs.isEmpty` assertions in tests.
  */
object CacheScope {

  private val active = new ThreadLocal[ArrayBuffer[DataFrame]]
  private val unscoped = new ArrayBuffer[DataFrame]

  /** `df.persist()` registered with the innermost active scope (or the
    * global registry when no scope is active).
    */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    val buf = active.get()
    if (buf != null) buf += p
    else unscoped.synchronized {
      // Auto-compact: bare (unscoped) use in a long-lived session would
      // otherwise grow this buffer forever — it holds plan references
      // until releaseAll(). Entries whose blocks are already gone (the
      // caller unpersisted directly, or clearCache() ran) carry no cache
      // to release, so drop them at each registration; the registry stays
      // bounded by the number of LIVE unscoped caches. A frame whose
      // session has been STOPPED throws IllegalStateException on
      // storageLevel — nothing releasable, compact it away; any OTHER
      // throw is treated as live (kept) so a transient error can't
      // silently evict a frame releaseAll() still needs to unpersist.
      unscoped.filterInPlace(d =>
        try d.storageLevel != StorageLevel.NONE
        catch {
          case _: IllegalStateException => false
          case _: Exception             => true
        })
      unscoped += p
    }
    p
  }

  /** Number of frames currently registered outside any scope (test hook). */
  private[graft] def unscopedSize: Int = unscoped.synchronized(unscoped.size)

  /** Materialize `df` into the scope's cache and return a PLAN-TRUNCATED
    * frame reading from it — the releasable twin of `localCheckpoint()`.
    * Iterative algorithms (the distributed connected-components loop)
    * need per-round plan truncation or Catalyst replans an ever-deeper
    * tree every round; `localCheckpoint` does that but its blocks cannot
    * be safely released (unpersisting a checkpoint breaks later reads —
    * the lineage is gone). Here the cache IS the fast path and the full
    * lineage remains behind it, so releasing is always safe: a
    * post-release re-read recomputes instead of failing.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count() // eager, like localCheckpoint(eager = true)
    // InternalRow leaf (rows copied out of reused scan buffers, exactly
    // as Dataset.checkpoint does) — no external-Row round trip
    org.apache.spark.sql.GraftExpressionBridge.dataFrameFromInternalRdd(
      p.sparkSession, p.queryExecution.toRdd.map(_.copy()), p.schema)
  }

  /** Run `body` in a fresh scope; unpersist everything the body persisted
    * (directly or through the operators it called) when it exits. The
    * terminal action on any frame built inside must run inside too.
    */
  def scoped[T](body: => T): T = {
    val prev = active.get()
    val buf = new ArrayBuffer[DataFrame]
    active.set(buf)
    try body
    finally {
      active.set(prev)
      release(buf)
    }
  }

  /** Unpersist every frame registered OUTSIDE any scope — the escape
    * hatch for bare library use in a long-lived session.
    */
  def releaseAll(): Unit = unscoped.synchronized {
    release(unscoped)
  }

  private def release(buf: ArrayBuffer[DataFrame]): Unit = {
    buf.foreach { d =>
      try d.unpersist(blocking = true)
      catch { case _: Exception => () } // session already stopped, etc.
    }
    buf.clear()
  }
}
