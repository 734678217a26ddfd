package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Burst-collapse event dedup ("debounce") — the log-compaction step
  * that turns retry storms, double-clicks, and sensor chatter into one
  * representative event per burst. Distinct from exact dedup (X1: same
  * CONTENT) and from streaming `dropDuplicatesWithinWatermark` (X15:
  * same KEY within a watermark): here nearby-in-TIME events of one key
  * collapse even though every row is unique.
  *
  * A burst is a maximal chain of consecutive events whose inter-event
  * gap is at most `gapSeconds` — the gaps-and-islands form (gap
  * measured to the PREVIOUS event, so bursts extend transitively),
  * chosen over "gap to last kept" throttling because islands are
  * expressible as one windowed running sum, while throttling is an
  * inherently sequential per-key fold no engine parallelizes.
  *
  * Scale shape: ONE shuffle on the key — the lag and the running-sum
  * window share the same (key, ts, id) ordering so they run in one
  * window stage; the burst aggregate is map-side combinable and
  * reduces output to burst grain (≤ input rows). Window partitions are
  * bounded by a single key's history, never the corpus; nothing
  * global, no self-join.
  *
  * Exactness: gaps are computed in whole epoch-micros (integer), the
  * burst boundary is `gap_us > gapSeconds·10⁶` (exact integer
  * compare), and the span is truncated whole seconds via integer div —
  * no float anywhere, so the oracle replays bit-for-bit. The ordering
  * key includes the event id so ts ties have one deterministic
  * predecessor in both engines.
  */
object Debounce {

  /** Burst gap in whole seconds — the oracle SQL interpolates THIS
    * constant, so tuning it moves both engines together. ~17% of the
    * fixture's per-user gaps fall under 2 h at every SF (mean gap
    * ≈ 39,000 s), so real collapsing happens without degenerating to
    * one burst per user. */
  val DefaultGapSeconds = 7200L

  /** Collapse `events` to burst grain: one row per (key, burst) with
    * the keeper (the burst's smallest event id — a deterministic,
    * engine-independent pick; ids are assigned in arrival order so it
    * is also the earliest event), the burst's event count, its start
    * timestamp and its whole-second span. */
  def bursts(events: DataFrame, key: String, ts: String, id: String,
      gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(col(key))
      .orderBy(col(ts), col(id))
    val scan = byTime.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .withColumn("gap_us",
        expr(s"unix_micros($ts)") - lag(expr(s"unix_micros($ts)"), 1)
          .over(byTime))
      .withColumn("new_burst",
        when(col("gap_us").isNull ||
          col("gap_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("burst_id", sum(col("new_burst")).over(scan))
      .groupBy(col(key), col("burst_id"))
      .agg(min(col(id)).cast("long").as("keeper_id"),
        count(lit(1)).cast("long").as("n_events"),
        min(col(ts)).as("burst_start"),
        expr(s"(max(unix_micros($ts)) - min(unix_micros($ts))) " +
          "div 1000000").cast("long").as("span_s"))
      .select(col(key), col("burst_id").cast("long").as("burst_id"),
        col("keeper_id"), col("n_events"), col("burst_start"),
        col("span_s"))
  }
}
