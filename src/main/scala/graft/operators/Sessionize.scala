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

  /** The SHARED session-grain frame (VERDICT r9 #5): gap-sessionize
    * the events table ONCE per (session, dir) and let every
    * session-grain consumer — the session report, the entry/exit flow
    * matrix (X187), conversion-by-depth (X185) — project from it
    * instead of re-running the user-key window each. At 100 TB the
    * session frame is the natural materialize-once derivation (a
    * production deployment would keep it as a bucketed table keyed by
    * user); here it is a [[graft.core.SessionCache]] tenant, priced as
    * its own `[cache:sessions]` tier in Bench.
    *
    * Islands form, break when the gap STRICTLY exceeds `DefaultGap` —
    * the same boundary the three consumers' DuckDB oracles replay.
    * Entry/exit picks are struct-min/max over the unique
    * (ts, event_id) total order, never an arbitrary `first()`; value
    * totals are exact integer cents (see [[sessions]]). */
  def sharedSessions(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.core.SessionCache.cached(spark, s"sessions:$dir") {
      import org.apache.spark.sql.expressions.Window
      val gapUs = DefaultGapHours * 3600L * 1000000L
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      graft.core.Tables(spark, dir, "events")
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("brk", when(lag(col("tus"), 1).over(byU).isNull ||
          col("tus") - lag(col("tus"), 1).over(byU) > gapUs, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(byU.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).cast("long").as("n_events"),
          sum(round(col("value") * 100).cast("long")).cast("long")
            .as("value_cents"),
          min(struct(col("tus"), col("event_id"), col("event_type")))
            .getField("event_type").as("entry_type"),
          max(struct(col("tus"), col("event_id"), col("event_type")))
            .getField("event_type").as("exit_type"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purchase"))
    }
}
