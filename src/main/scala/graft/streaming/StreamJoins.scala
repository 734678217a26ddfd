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
    joined(left, right, key, leftTs, rightTs, tolerance, "inner")

  /** LEFT OUTER interval join (X258) — the production shape is "views
    * with NO purchase within the bound": a left row that finds no
    * partner inside the tolerance window still emits, null-padded on
    * the right. On streams this is exactly the state-EVICTION
    * semantics worth proving: the engine can only declare a left row
    * unmatched once the (min-across-sources) watermark passes
    * `leftTs + tolerance` — no right partner can arrive anymore — so
    * null-padded rows surface on watermark advance, never eagerly.
    * Same two-sided bound, same per-side state eviction rule as the
    * inner form; identical expression on batch frames, where it plans
    * as an ordinary left join (`events_range_join_left` is the
    * oracle-checked batch proof). */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      tolerance: String = "30 minutes"): DataFrame =
    joined(left, right, key, leftTs, rightTs, tolerance, "left_outer")

  /** FULL OUTER interval join (X270) — both production questions in
    * one frame: "views with NO purchase within the bound" AND
    * "purchases with NO view" (orphan conversions — attribution bugs,
    * lost impressions). The two-sided eviction is the strictly
    * stronger state proof over X258: EACH side's rows emit null-padded
    * only once the global watermark passes that row's own
    * `ts + tolerance` bound, and each store retires its rows
    * independently. The key column survives from whichever side is
    * present (`coalesce`), since either side may be the null-padded
    * one. Identical expression on batch frames, where it plans as an
    * ordinary full join (`events_range_join_full` is the oracle-checked
    * batch proof via [[graft.operators.RangeJoin.pointInRangeFull]]'s
    * equivalent decomposition). */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      tolerance: String = "30 minutes"): DataFrame = {
    val j = left.join(right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $tolerance") &&
        col(rightTs) <= col(leftTs) + expr(s"interval $tolerance"),
      "full_outer")
    val rest = left.columns.filter(_ != key).map(left(_)) ++
      right.columns.filter(_ != key).map(right(_))
    j.select(coalesce(left(key), right(key)).as(key) +: rest.toSeq: _*)
  }

  private def joined(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tolerance: String,
      how: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $tolerance") &&
        col(rightTs) <= col(leftTs) + expr(s"interval $tolerance"),
      how)
      .drop(right(key))

  /** Stream-static enrichment join (X230) — the dimension lookup a
    * live feed runs per micro-batch: the static side BROADCASTS (it
    * must — a shuffle against an unbounded stream has no barrier to
    * wait on), the join is LEFT so an unknown key never drops an
    * event, and `is_enriched` carries the J2 guarded-lookup verdict
    * so the unmatched side-output (the J7 error feed) is one filter
    * away. The same expression runs identically on batch frames —
    * the shared batch/stream-transform discipline; the MemoryStream
    * spec asserts the per-micro-batch result row-equals the batch
    * mirror, including a dim key arriving in no event and an event
    * key missing from the dim.
    *
    * Scale: the dim re-broadcasts per micro-batch at current Spark
    * semantics — size it like any broadcast dim (small, or pre-filter
    * to the active key range); the stream side never shuffles. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame = {
    val dimCols = dim.columns.filter(_ != key)
    require(dimCols.nonEmpty, "enrich: dim carries only the key")
    // is_enriched comes from a synthetic always-non-null marker on the
    // dim side, not from dim attribute nullability — a matched key
    // whose first attribute is legitimately NULL is still enriched,
    // and the verdict never depends on dim column ordering.
    stream.join(broadcast(dim.withColumn("__hit", lit(1L))),
        Seq(key), "left")
      .withColumn("is_enriched",
        when(col("__hit").isNotNull, 1L).otherwise(0L))
      .drop("__hit")
  }
}
