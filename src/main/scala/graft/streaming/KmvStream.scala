package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count sketch — the
  * [[graft.operators.KmvSketch]] estimator maintained as PER-GROUP
  * STREAMING STATE: each group's k smallest distinct hashes live in a
  * `GroupState` cell (O(k) per group, independent of stream length),
  * every micro-batch merges its arrivals by the lossless
  * union-and-re-truncate rule, and a snapshot row (count, k-th hash,
  * estimate) emits per touched group per batch — the live
  * distinct-users board a dashboard reads without ever re-scanning
  * history.
  *
  * Contract (the incremental-rollup discipline, X68): after ANY prefix
  * of micro-batches, a group's stored sketch is IDENTICAL to the batch
  * [[graft.operators.KmvSketch.kmvDistinct]] over that prefix's rows —
  * merge order cannot matter because the k-min set is a bounded
  * semilattice (union + truncate is associative, commutative,
  * idempotent). The spec replays prefixes and asserts equality; the
  * batch operator's DuckDB oracle therefore covers the arithmetic,
  * and the streaming spec covers persistence.
  */
object KmvStream {

  case class KeyedHash(grp: String, h: Long)
  case class SketchState(hashes: Seq[Long]) // ascending, length <= k
  case class SketchSnap(grp: String, n_kept: Long, kth_hash: Long,
    est_distinct: Long)

  val HashSpan = graft.operators.KmvSketch.HashSpan

  /** Events frame -> (group, hash) rows with the library's md5-hex8
    * integer hash — the same derivation the batch operator uses. */
  def keyedHashes(events: DataFrame, key: String,
      value: String): Dataset[KeyedHash] = {
    import events.sparkSession.implicits._
    events.select(col(key).cast("string").as("grp"),
      expr(s"CAST(conv(substring(md5(CAST($value AS STRING)), 1, 8), " +
        "16, 10) AS BIGINT)").as("h")).as[KeyedHash]
  }

  private def snap(grp: String, hashes: Seq[Long], k: Int): SketchSnap = {
    val est = if (hashes.length < k) hashes.length.toLong
      else (k - 1).toLong * HashSpan / math.max(hashes.last, 1L)
    SketchSnap(grp, hashes.length.toLong,
      hashes.lastOption.getOrElse(0L), est)
  }

  /** One snapshot per touched group per micro-batch; state is the
    * sketch itself. Runs identically on a batch Dataset (one group
    * call, empty state) — the shared batch/stream-transform
    * discipline. */
  def sketchStream(ds: Dataset[KeyedHash],
      k: Int = 64): Dataset[SketchSnap] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[KeyedHash],
         state: GroupState[SketchState]) =>
          val prior = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val merged = (prior ++ rows.map(_.h))
            .distinct.sorted.take(k)
          state.update(SketchState(merged))
          Iterator(snap(g, merged, k))
      }
  }
}
