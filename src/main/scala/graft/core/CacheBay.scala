package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for per-query transient persists.
  *
  * Two cache lifetimes exist in the engine:
  *  - long-lived shared lineages ([[Star.siop]]/[[Star.calendar]]) that
  *    many registry queries reuse within one session, and
  *  - per-query intermediates (dedup signature frames read by both join
  *    sides) that must not accumulate across a 50+-query sweep.
  *
  * `spark.catalog.clearCache()` can't tell them apart — it would evict
  * the shared star fact after every query and re-pay its 4-table join
  * 16 times. Operators therefore register their transient persists
  * here, and Bench/Verify call [[drain]] between queries: registered
  * frames are unpersisted, everything else (the shared star cache)
  * survives.
  */
object CacheBay {
  private val live = scala.collection.mutable.Buffer[Dataset[_]]()

  /** Persist a dataset and register it for the next [[drain]].
    *
    * A dataset whose plan is ALREADY cached (its own persist, or a
    * plan-identical projection of a [[SessionCache]] tier — Spark's
    * cache lookup matches by `sameResult`, so `tier.select(<all its
    * columns>)` hits the tier's entry) is returned untouched: calling
    * `persist` would be a no-op on the existing entry, and the later
    * [[drain]]'s `unpersist` would then EVICT the long-lived tier —
    * the r16 `graph_scc`/`graph_reciprocity` regression (tier
    * silently dropped mid-sweep, every later consumer re-paying the
    * fact-grain derivation). */
  def register[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized {
      if (ds.storageLevel != StorageLevel.NONE) ds
      else { live += ds.persist(level); ds }
    }

  /** Unpersist every registered transient frame (non-blocking). */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
