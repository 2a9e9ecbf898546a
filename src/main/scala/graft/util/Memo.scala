package graft.util

import org.apache.spark.sql.DataFrame

/** Bounded LRU session memo with an unpersist-on-evict hook.
  *
  * Session memos cache derived artifacts (pair sets, index frames, prepared
  * scans) keyed by (session, data dir, params). An unbounded map is harmless
  * in a per-round driver, but a long-lived service session iterating over
  * many data dirs would accumulate persisted frames without end — so every
  * memo is bounded: past `maxEntries` the LEAST-RECENTLY-USED entry is
  * evicted (access-order LinkedHashMap — a hot entry created early is kept,
  * FIFO would evict it first) and its `onEvict` hook releases its executor
  * storage; `clear()` evicts everything.
  *
  * Concurrency: map reads/writes are synchronized, but the `build` closure
  * runs OUTSIDE the lock — it launches full Spark jobs and driver collects,
  * and holding the monitor across it would serialize every query touching
  * the memo behind one build (and nest locks when one memoized build calls
  * another). Two threads racing the same cold key may both build; the
  * winner's value is returned so all callers see one canonical artifact.
  * The loser's value is NOT released: Spark's CacheManager keys cached data
  * by logical plan, so the loser's frames usually have plans IDENTICAL to
  * the winner's — running `onEvict` on them would silently drop the
  * winner's shared cache entries (its persisted result and deps). Keeping
  * the loser costs nothing for plan-keyed persists (same cache entry);
  * checkpoint-backed values (distinct RDDs per call) are reclaimed by the
  * ContextCleaner once the loser's references go out of scope. Memo traffic
  * is driver-side query planning — a handful of lookups per query, never
  * per-row.
  */
final class Memo[K, V](maxEntries: Int = 64)(onEvict: V => Unit) {
  Memo.register(this)
  // access-order = true: get() touches an entry, eviction order is LRU
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true)

  private def release(v: V): Unit = try onEvict(v) catch { case _: Throwable => () }

  def getOrElseUpdate(k: K)(build: => V): V = {
    val hit = synchronized {
      if (m.containsKey(k)) Some(m.get(k)) else None
    }
    hit.getOrElse {
      val v = build // outside the lock — may run Spark jobs / nested memos
      synchronized {
        if (m.containsKey(k)) {
          // Lost the race: keep the canonical value and DON'T release the
          // loser — its persisted plans alias the winner's CacheManager
          // entries, so onEvict here would de-cache the canonical artifact
          // (checkpoint RDDs fall to the ContextCleaner instead).
          m.get(k)
        } else {
          m.put(k, v)
          while (m.size > maxEntries) {
            val it = m.entrySet().iterator()
            release(it.next().getValue)
            it.remove()
          }
          v
        }
      }
    }
  }

  /** Evict every entry, running the release hook on each. */
  def clear(): Unit = synchronized {
    m.values.forEach(v => release(v))
    m.clear()
  }

  def size: Int = synchronized(m.size)
}

object Memo {
  private val all = new java.util.concurrent.CopyOnWriteArrayList[Memo[_, _]]()
  private def register(memo: Memo[_, _]): Unit = all.add(memo)

  /** Evict every registered session memo in the engine (service-session
    * housekeeping between data dirs; disk IndexStore artifacts stay). */
  def clearAll(): Unit = all.forEach(_.clear())

  /** Release hook for plain `.persist()`ed frames. */
  val unpersistDf: DataFrame => Unit = df => df.unpersist()

  /** Release hook for `localCheckpoint()`ed frames: the checkpoint's RDD is
    * persisted at the RDD layer (not the SQL CacheManager), so
    * `df.unpersist()` is a no-op on it — dig the RDD out of the LogicalRDD
    * leaf and unpersist that. Reflection keeps us off the private
    * constructor surface; a plan without a LogicalRDD leaf is left alone
    * (the ContextCleaner reclaims it after GC as before). */
  val releaseCheckpoint: DataFrame => Unit = df =>
    df.queryExecution.analyzed.collectLeaves().foreach { leaf =>
      if (leaf.getClass.getSimpleName == "LogicalRDD")
        try leaf.getClass.getMethod("rdd").invoke(leaf)
          .asInstanceOf[org.apache.spark.rdd.RDD[_]].unpersist(false)
        catch { case _: Throwable => () }
    }
}
