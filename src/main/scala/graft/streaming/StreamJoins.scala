package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the two-live-feeds correlation the Structured
  * Streaming surface adds over stream-static enrichment: both sides
  * buffer keyed state and the event-time bound (plus each side's
  * watermark) is what lets the engine EVICT that state, so memory stays
  * proportional to the tolerance window, not the stream history.
  *
  * The same expression runs identically on batch frames (where it plans
  * as an ordinary join) — the shared batch/stream-transform discipline
  * the rest of `graft.streaming` follows; `events_range_join` is the
  * oracle-checked batch proof of the containment semantics, and the
  * MemoryStream spec proves cross-batch buffering + watermark eviction.
  */
object StreamJoins {

  /** Inner interval join: rows of `left` and `right` with equal `key`
    * whose event times are within `tolerance` of each other
    * (inclusive). Non-key column names must be disjoint (rename before
    * calling). For streaming inputs both sides must carry a watermark;
    * the symmetric two-sided bound gives the engine an eviction rule
    * for BOTH state stores. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      tolerance: String = "30 minutes"): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $tolerance") &&
        col(rightTs) <= col(leftTs) + expr(s"interval $tolerance"))
      .drop(right(key))
}
