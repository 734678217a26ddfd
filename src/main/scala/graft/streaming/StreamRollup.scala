package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.analytics.Analytics

/** Streaming incremental rollup: the [[Analytics.mergeRollups]] update
  * path driven by a stream — each micro-batch's per-key rollup is
  * merged into the stored rollup, so the running aggregate is always
  * current at cost |keys| + |batch|, never |history|.
  *
  * `foreachBatch` delivers at-least-once: after a crash the last batch
  * can be REDELIVERED, and a blind merge would double-count it. The
  * guard is the standard idempotence recipe — persist the last applied
  * batch id next to the target and make a replayed id a no-op — which
  * upgrades the sink to effectively-once. The swap itself is
  * write-tmp-then-overwrite (same non-atomicity note as
  * [[graft.load.Sinks.deleteWhere]]; the cluster-scale form is a
  * transactional table format's MERGE).
  */
object StreamRollup {

  private def markerPath(targetPath: String) = new Path(targetPath + ".batchid")

  /** Merge one micro-batch into the stored rollup. Returns false (and
    * changes nothing) when `id` was already applied — the replay
    * guard. Public so tests drive redelivery directly. */
  def mergeBatch(batch: DataFrame, id: Long, targetPath: String): Boolean = {
    val spark = batch.sparkSession
    val fs = markerPath(targetPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val last: Long =
      if (!fs.exists(markerPath(targetPath))) -1L
      else {
        val in = fs.open(markerPath(targetPath))
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    if (id <= last) return false
    val newRoll = Analytics.eventRollup(batch)
    val merged =
      if (!fs.exists(new Path(targetPath))) newRoll
      else Analytics.mergeRollups(spark.read.parquet(targetPath), newRoll,
        Seq("user_id", "event_type"))
    val tmp = targetPath + "__rewrite"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(targetPath)
    fs.delete(new Path(tmp), true)
    val out = fs.create(markerPath(targetPath), true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    true
  }

  /** The stream writer: events (user_id, event_type, value) → stored
    * per-key rollup kept current per micro-batch. */
  def sink(events: DataFrame, targetPath: String): DataStreamWriter[Row] =
    events.writeStream.foreachBatch(
      (batch: org.apache.spark.sql.Dataset[Row], id: Long) => {
        mergeBatch(batch, id, targetPath); ()
      })
}
