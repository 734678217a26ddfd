package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization via Spark's `session_window` — the dynamic
  * (merge-on-overlap) window the streaming surface uses, runnable
  * identically on batch frames: events of one key belong to the same
  * session while each is within `gap` of the previous; the session
  * spans [first event, last event + gap).
  *
  * In batch the plan is one shuffle on the key + a sort-merge of
  * overlapping windows (no cross join, no explode). In streaming the
  * SAME expression runs under a watermark with state merged per key —
  * the batch oracle below is the correctness proof for both, per the
  * engine's shared batch/stream-transform discipline
  * (`StreamIngest.parsePayload`). */
object Sessionize {

  /** Gap in hours — the oracle SQL interpolates THIS constant (as
    * `INTERVAL n HOUR`), so tuning it moves both engines together. */
  val DefaultGapHours = 6
  val DefaultGap = s"$DefaultGapHours hours"

  /** The session value total is EXACT INTEGER CENTS, not
    * `round(SUM(double), 4)`: the observed values carry two decimals,
    * so ×100 accumulation is associative-exact, while cross-engine
    * double summation order differs (DuckDB windows sum via a segment
    * tree) — exactly the decimal-tie class that broke hashes at sf0.1
    * elsewhere in this repo. Same discipline as `events_spike_scores`. */
  def sessions(events: DataFrame, key: String, ts: String,
      value: String, gap: String = DefaultGap): DataFrame =
    events.groupBy(col(key), session_window(col(ts), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col(value) * 100).cast("long")).as("value_cents"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_cents"))
}
