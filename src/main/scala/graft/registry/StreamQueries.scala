package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.streaming.StreamIngest

/** Registry: streaming-semantics coverage (SURVEY §2.9 S16/S17, F29).
  * The payload transform is identical for batch and stream frames, so
  * the batch round-trip below IS the correctness proof for the socket
  * path (the socket transport itself is exercised in ScalaTest via
  * MemoryStream — no TCP in CI, per SURVEY §7.4).
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S16: producer JSON payload → from_json(Map) → explode round trip
    "stream_payload_roundtrip" -> ((s, d) =>
      StreamIngest.payloadRoundTrip(s, d)),

    // F29: JSON decode of an at-rest JSON column
    "events_json_props" -> ((s, d) =>
      Tables(s, d, "events").select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))),

    // Tumbling-window aggregate — the Structured Streaming windowed-agg
    // shape, runnable identically on the batch frame
    "events_tumbling_window" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 4).as("value_sum"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("value_sum"))),

    // MLlib streaming consumer, batch-mode mirror: per-micro-batch
    // incremental logistic-regression refit over the events feed, one
    // metrics row per batch (no SQL oracle — model training is not
    // SQL-expressible; covered by StreamingTrainerSpec's MemoryStream
    // convergence test and the driver's rows-only check)
    "ml_stream_train" -> ((s, d) =>
      graft.streaming.StreamingTrainer.trainOnEvents(s, d)))

  val oracles: Map[String, String] = Map(
    "stream_payload_roundtrip" ->
      """SELECT event_id % 100 AS row_index, value AS feature0,
        |       CAST(user_id AS DOUBLE) AS feature1,
        |       event_type AS label
        |FROM events""".stripMargin,

    "events_json_props" ->
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "events_tumbling_window" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
        |       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR
        |         AS window_end,
        |       event_type, COUNT(*) AS n,
        |       ROUND(SUM(value), 4) AS value_sum
        |FROM events GROUP BY 1, 2, 3""".stripMargin)
}
