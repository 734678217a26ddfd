package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.analytics.Analytics

/** Streaming incremental rollup: the [[Analytics.mergeRollups]] update
  * path driven by a stream — each micro-batch's per-key rollup is
  * merged into the stored rollup, so the running aggregate is always
  * current at cost |keys| + |batch|, never |history|.
  *
  * `foreachBatch` delivers at-least-once: after a crash the last batch
  * can be REDELIVERED, and a blind merge would double-count it. The
  * guard persists the applied batch id ATOMICALLY WITH the data: each
  * merge writes a fresh `v<id>` version directory, and a version only
  * becomes current once the parquet commit protocol drops its
  * `_SUCCESS` marker — the active state is "the highest committed
  * version", so there is no separate pointer file whose update could
  * race the data rewrite. A crash mid-write leaves an uncommitted
  * directory (no `_SUCCESS`) that readers ignore and the redelivered
  * batch simply overwrites; a crash after commit makes the redelivery
  * a no-op (`id <= currentVersion`). Superseded versions are deleted
  * best-effort AFTER the new one is committed. This is effectively-once
  * without a transactional table format; the cluster-scale form is a
  * format whose MERGE carries the same commit-then-GC structure.
  */
object StreamRollup {

  private val VersionDir = "^v(\\d+)$".r

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest committed (has `_SUCCESS`) version id under `root`, or -1
    * when none exists — the replay-guard watermark AND the read
    * pointer, derived from one directory listing. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    if (!fs.exists(new Path(root))) return -1L
    fs.listStatus(new Path(root)).iterator.flatMap { st =>
      st.getPath.getName match {
        case VersionDir(id)
            if fs.exists(new Path(st.getPath, "_SUCCESS")) => Some(id.toLong)
        case _ => None
      }
    }.foldLeft(-1L)(math.max)
  }

  /** The current stored rollup (None before the first commit). */
  def current(spark: SparkSession, root: String): Option[DataFrame] = {
    val v = currentVersion(spark, root)
    if (v < 0) None else Some(spark.read.parquet(s"$root/v$v"))
  }

  /** Merge one micro-batch into the stored rollup. Returns false (and
    * changes nothing) when `id` was already committed — the replay
    * guard. Public so tests drive redelivery directly. */
  def mergeBatch(batch: DataFrame, id: Long, root: String): Boolean = {
    val spark = batch.sparkSession
    val last = currentVersion(spark, root)
    if (id <= last) return false
    val newRoll = Analytics.eventRollup(batch)
    val merged =
      if (last < 0) newRoll
      else Analytics.mergeRollups(spark.read.parquet(s"$root/v$last"),
        newRoll, Seq("user_id", "event_type"))
    // reads v<last>, writes v<id> — never overwrites what it reads, so
    // no tmp-dir dance; the _SUCCESS file IS the atomic commit point
    merged.write.mode(SaveMode.Overwrite).parquet(s"$root/v$id")
    // GC superseded versions only after the new commit; a crash here
    // leaves extra directories, never a wrong answer
    val fs = fsOf(spark, root)
    fs.listStatus(new Path(root)).foreach { st =>
      st.getPath.getName match {
        case VersionDir(v) if v.toLong < id => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    true
  }

  /** The stream writer: events (user_id, event_type, value) → stored
    * per-key rollup kept current per micro-batch. */
  def sink(events: DataFrame, root: String): DataStreamWriter[Row] =
    events.writeStream.foreachBatch(
      (batch: org.apache.spark.sql.Dataset[Row], id: Long) => {
        mergeBatch(batch, id, root); ()
      })
}
