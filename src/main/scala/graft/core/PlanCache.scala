package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded per-session cache for expensive intermediate frames (banded LSH
  * tables, analytics edge projections, IVF centroids).
  *
  * Library operators that persist an intermediate face a tension: never
  * unpersisting leaks a CacheManager entry per call for the session lifetime,
  * while unpersisting before returning forfeits reuse when the same operator
  * runs again over the same input (interactive sessions and benchmarks do
  * this constantly — the logical plan is identical, so the second call can
  * serve the cached frame instead of recomputing the dominant stage).
  *
  * Resolution: a small LRU keyed by (operator, input-plan semantic hash,
  * params). A repeated call returns the already-persisted frame; once more
  * than `MaxEntries` distinct frames are live, the least-recently-used is
  * unpersisted — so total cached storage is bounded for any call pattern.
  *
  * Session hygiene is bounded on THREE axes (a WeakHashMap alone would NOT
  * work — the cached DataFrames strongly reference their own session,
  * pinning the weak key forever):
  *  - the per-session map count is itself an LRU capped at `MaxSessions`:
  *    a process cycling `newSession()` clones (which share one context and
  *    never individually "stop") evicts the oldest clone's entries instead
  *    of accumulating dead maps;
  *  - every `cached` call sweeps sessions whose context has stopped;
  *  - one listener per CONTEXT (not per session — a listener per clone would
  *    itself leak) drops all that context's session maps on application end.
  *
  * SNAPSHOT SEMANTICS: a cached frame is a frozen snapshot of its input at
  * first computation, exactly like `DataFrame.persist`. If the underlying
  * files are overwritten mid-session, call `invalidate`/`clear` before
  * re-running the operator, or the stale frame is served (same contract as
  * Spark's own cache over mutated paths).
  */
object PlanCache {
  private val MaxEntries = 16
  private val MaxSessions = 8

  private type EntryMap = java.util.LinkedHashMap[String, DataFrame]

  private val caches =
    new java.util.LinkedHashMap[SparkSession, EntryMap](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, EntryMap]): Boolean = {
        val evict = size() > MaxSessions
        if (evict && !e.getKey.sparkContext.isStopped)
          e.getValue.values.forEach(_.unpersist(false))
        evict
      }
    }

  // contexts that already carry the cleanup listener (weak: dies with the SC)
  private val listenerInstalled = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())

  /** Stable cache key: operator tag + semantic hash of the input plan +
    * operator parameters. */
  def key(op: String, input: DataFrame, params: Any*): String =
    s"$op:${input.queryExecution.logical.semanticHash()}:${params.mkString(",")}"

  /** Return the cached frame for `key`, or persist `build` and register it
    * (evicting + unpersisting the LRU entry past capacity). */
  def cached(spark: SparkSession, cacheKey: String)(build: => DataFrame): DataFrame =
    synchronized {
      sweepStopped()
      var m = caches.get(spark)
      if (m == null) {
        val sc = spark.sparkContext
        if (listenerInstalled.add(sc)) {
          sc.addSparkListener(new SparkListener {
            override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
              PlanCache.dropContext(sc)
          })
        }
        m = new EntryMap(16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, DataFrame]): Boolean = {
            val evict = size() > MaxEntries
            if (evict) e.getValue.unpersist(false)
            evict
          }
        }
        caches.put(spark, m)
      }
      val hit = m.get(cacheKey)
      if (hit != null) hit
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        m.put(cacheKey, df)
        df
      }
    }

  /** Live session-map count (bounded by MaxSessions; exposed for tests). */
  def sessionCount: Int = synchronized { caches.size() }

  /** Unpersist and forget one cached entry (use after overwriting the files
    * a cached operator read — see SNAPSHOT SEMANTICS above). */
  def invalidate(spark: SparkSession, cacheKey: String): Unit = synchronized {
    val m = caches.get(spark)
    if (m != null) {
      val df = m.remove(cacheKey)
      if (df != null) df.unpersist(false)
    }
  }

  /** Drop and unpersist everything cached for a session. */
  def clear(spark: SparkSession): Unit = synchronized {
    val m = caches.remove(spark)
    if (m != null) m.values.forEach(_.unpersist(false))
  }

  /** Forget entries of sessions whose context has stopped (their cached
    * blocks died with the executors — nothing to unpersist). */
  private def sweepStopped(): Unit = {
    val it = caches.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** Forget every session map of a stopped context. */
  private def dropContext(sc: SparkContext): Unit = synchronized {
    val it = caches.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
  }
}
