package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Precise release of the frames the engine persists internally
  * (ADVICE r9: the trained-quantizer prelude and its consumers expose
  * no unpersist path, so a long-lived session accumulates their cached
  * blocks; `spark.catalog.clearCache()` is the sledgehammer that also
  * evicts the USER's caches).
  *
  * Accumulation is bounded, not unbounded: Spark's CacheManager keys
  * cache entries by canonicalized plan, so repeated calls with the
  * same (corpus, parameters) reuse ONE entry (the "Asked to cache
  * already cached data" warning) — the registry only grows with
  * DISTINCT parameter combos, i.e. a sweep. [[release]] unpersists
  * everything the engine registered and nothing else. Blocking=false:
  * eviction proceeds asynchronously, callers never wait on it.
  */
object CacheRegistry {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for [[release]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    tracked.add(p)
    p
  }

  /** Unpersist every engine-registered frame. Safe to call at any
    * point (frames are re-persisted on next use by the plan-keyed
    * CacheManager) and safe against already-stopped sessions.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = tracked.poll()
    }
  }

  /** Registered-frame count (diagnostics; not the block count). */
  def size: Int = tracked.size()

  /** Call-site sugar so operator code keeps the `.persist(...)` chain
    * shape: `.trackedPersist(...)` persists AND registers.
    */
  implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def trackedPersist(): DataFrame = CacheRegistry.persist(df)
    def trackedPersist(level: StorageLevel): DataFrame =
      CacheRegistry.persist(df, level)
  }
}
