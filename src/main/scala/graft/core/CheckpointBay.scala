package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset

/** Registry for `localCheckpoint` block lifetimes — the third cache
  * lifetime beside [[CacheBay]] (per-query persists) and
  * [[SessionCache]] (session-shared tiers).
  *
  * The iterative operators (CC/SCC/LPA/PageRank/Brandes/BPE/k-core…)
  * `localCheckpoint` per round to truncate their growing lineage. The
  * blocks behind a local checkpoint, however, are NOT released by
  * `Dataset.unpersist` on anything downstream and are NOT tracked by
  * [[CacheBay]] — they live until the driver garbage-collects the RDD
  * and the ContextCleaner notices, which in a long sweep is
  * effectively "never soon enough". Measured effect (r16 triage of
  * the `text_source_vocab_overlap` 2×): after the three
  * checkpoint-heavy graph queries, an unrelated shuffle-heavy query
  * ran 3.09 s vs 1.82 s with the same session caches resident — the
  * leaked checkpoint blocks squeeze execution memory for everything
  * that follows.
  *
  * Every checkpoint therefore routes through [[checkpoint]], which
  * captures the newly-persisted checkpoint RDD (diff of
  * `sc.getPersistentRDDs`, filtered to `isCheckpointed` — eager checkpoint → true — so a
  * lazily-materializing upstream cache is never captured), and
  * Bench/Verify call [[drain]] between queries alongside
  * `CacheBay.drain()`.
  *
  * Safety: dropping a local checkpoint's blocks makes the RDD
  * unrecoverable, so [[drain]] must only run when no LIVE frame can
  * recompute through a drained checkpoint. The harness guarantees
  * this by draining at query boundaries: [[SessionCache]] tiers that
  * build through checkpointing loops are fully materialized (tier
  * `count()`) before the first drain, and a materialized
  * MEMORY_AND_DISK cache in a single-JVM local session never
  * re-reads its source. On a multi-executor cluster (where executor
  * loss CAN force recompute of a cached tier) the equivalent
  * discipline is reliable `checkpoint()` to the cluster FS for
  * session-lifetime tiers — same API seam, different durability.
  */
object CheckpointBay {
  private val live = scala.collection.mutable.Buffer[RDD[_]]()

  // Spark WARNs "RDD N was locally checkpointed … cannot be recomputed
  // after unpersisting" on every drained checkpoint — in a 360-query
  // sweep that is thousands of lines describing exactly the intended
  // behavior (the safety contract lives in this object's scaladoc, and
  // [[drain]] only runs at query boundaries where no live frame can
  // recompute through the dropped blocks). Quiet that one logger; the
  // rest of org.apache.spark.rdd keeps its levels.
  try org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.rdd.MapPartitionsRDD",
    org.apache.logging.log4j.Level.ERROR)
  catch { case _: Throwable => () }

  /** `ds.localCheckpoint()` with the checkpoint blocks registered for
    * the next [[drain]]. */
  def checkpoint[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cp = ds.localCheckpoint()
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      // isCheckpointed (public API) is true here because the
      // localCheckpoint above is eager; a lazily-materializing
      // upstream CACHE RDD in the diff is never checkpointed
      if (!before.contains(id) && rdd.isCheckpointed) live += rdd
    }
    cp
  }

  /** Release every registered checkpoint's blocks (non-blocking). */
  def drain(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }

  /** Registered-but-undrained checkpoint count (test observability). */
  def liveCount: Int = synchronized(live.size)

  /** Implicit sugar so call sites read like the stock API:
    * `df.trackedCheckpoint()` ≡ `CheckpointBay.checkpoint(df)`. */
  implicit class Checkpointable[T](private val ds: Dataset[T])
      extends AnyVal {
    def trackedCheckpoint(): Dataset[T] = CheckpointBay.checkpoint(ds)
  }
}
