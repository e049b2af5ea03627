package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Precise release of the frames the engine persists internally
  * (ADVICE r9: the trained-quantizer prelude and its consumers expose
  * no unpersist path, so a long-lived session accumulates their cached
  * blocks; `spark.catalog.clearCache()` is the sledgehammer that also
  * evicts the USER's caches).
  *
  * Registrations are keyed by the CANONICALIZED analyzed plan — the
  * same key Spark's CacheManager dedupes cache entries by — so
  * repeated calls with the same (corpus, parameters) hold ONE tracked
  * reference, mirroring the single cache entry they share (ADVICE r10:
  * a per-call queue grew one plan-tree reference per call in a
  * long-lived session even though the block cache didn't). The
  * registry therefore only grows with DISTINCT parameter combos, i.e.
  * a sweep. [[release]] unpersists everything the engine registered
  * and nothing else. Blocking=false: eviction proceeds asynchronously,
  * callers never wait on it.
  */
object CacheRegistry {
  private val tracked =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, DataFrame]()

  /** Persist `df` at `level` and register it for [[release]]. One
    * tracked entry per canonicalized plan: re-registering an
    * already-tracked plan is a no-op beyond Spark's own idempotent
    * re-persist (which logs "already cached" and keeps the first
    * entry — including its ORIGINAL storage level; a differing
    * `level` on a repeat call never takes effect, in the registry or
    * in the CacheManager).
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    tracked.putIfAbsent(p.queryExecution.analyzed.canonicalized, p)
    p
  }

  /** Unpersist every engine-registered frame. Safe to call at any
    * point (frames are re-persisted on next use by the plan-keyed
    * CacheManager) and safe against already-stopped sessions — a
    * frame whose session died just drops from tracking.
    */
  def release(): Unit = release(blocking = false)

  /** As [[release]]; `blocking = true` waits for eviction to complete
    * before returning. Measurement harnesses that release BETWEEN
    * timed iterations of the same query must block: an async eviction
    * racing the next iteration's re-persist of the same canonicalized
    * plan can hand that run a dying cache entry whose blocks vanish
    * under it — per-partition recompute of the whole child subtree,
    * observed as an 8× outlier iteration (r14, q177 at 50×). Library
    * callers releasing at session end keep the non-blocking default.
    */
  def release(blocking: Boolean): Unit = {
    val it = tracked.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      try e.getValue.unpersist(blocking)
      catch { case NonFatal(_) => () }
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
