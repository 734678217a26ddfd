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

  /** Persist a dataset and register it for the next [[drain]]. */
  def register[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized { live += ds.persist(level); ds }

  /** Unpersist every registered transient frame (non-blocking). */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
