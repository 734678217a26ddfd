package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.streaming.StreamDrift

/** X319: the streaming per-source drift CUSUM — sequential recurrence
  * state after N micro-batches equals the batch mirror's closed-form
  * last row per source, a degrading source alarms while a stable one
  * holds cusum 0 (the max(0,·) clamp), and a replayed batch id is a
  * no-op. */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  test("stream state equals the batch mirror; rot alarms, ok clamps " +
    "at 0; replayed batch is a no-op") {
    // long stopword-rich text scores high; short punct-heavy low
    val good = ("the of and to in a is that it was " * 20).trim
    def degraded(level: Int) = "!!! ??? ;;; " * (2 + level)
    // 6 arrival batches (batch = doc_id % 6): "ok" stays good, "rot"
    // degrades from batch 1 on
    val rows = (0 until 6).flatMap { b =>
      (0 until 5).map { i =>
        (b.toLong + 6L * (2 * i), good, "en", "ok", good.length.toLong)
      } ++ (0 until 5).map { i =>
        val t = if (b == 0) good else degraded(b)
        (b.toLong + 6L * (2 * i + 1), t, "en", "rot", t.length.toLong)
      }
    }
    val all = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val mirror = Pipeline.sourceQualityDrift(all)
      .filter(col("batch") === 5L)
      .select("source", "base_q_e6", "k", "cusum", "is_alarm")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    val root = java.nio.file.Files.createTempDirectory("drift_").toFile
    val target = new java.io.File(root, "state").getAbsolutePath
    val ms = MemoryStream[(Long, String, String, String, Long)](
      org.apache.spark.sql.Encoders
        .product[(Long, String, String, String, Long)],
      spark.sqlContext)
    val docs = ms.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = StreamDrift.sink(docs, target)
      .option("checkpointLocation",
        new java.io.File(root, "ckpt").getAbsolutePath)
      .start()
    try {
      (0 until 6).foreach { b =>
        ms.addData(rows.filter(_._1 % 6 == b))
        q.processAllAvailable()
      }
      val stored = StreamDrift.current(spark, target).get
        .select("source", "base_q_e6", "k", "cusum", "is_alarm")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(stored.keySet == Set("ok", "rot"))
      // recurrence ≡ closed form: final state matches the mirror
      assert(stored("ok") == mirror("ok"), s"ok: ${stored("ok")} " +
        s"vs mirror ${mirror("ok")}")
      assert(stored("rot") == mirror("rot"), s"rot: ${stored("rot")} " +
        s"vs mirror ${mirror("rot")}")
      // the stable source never accumulates (the max(0,·) clamp) …
      assert(stored("ok")._4 == 0L && stored("ok")._5 == 0L)
      // … the degrading one alarms
      assert(stored("rot")._4 > 0L && stored("rot")._5 == 1L)
      // replay guard: an already-committed batch id changes nothing
      val v = StreamDrift.currentVersion(spark, target)
      assert(!StreamDrift.applyBatch(
        all.limit(3), id = 0L, target))
      assert(StreamDrift.currentVersion(spark, target) == v)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }
}
