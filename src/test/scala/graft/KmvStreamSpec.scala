package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.KmvStream

/** Streaming KMV state: after any prefix of micro-batches, each
  * group's emitted snapshot equals the BATCH sketch over that prefix
  * (merge = union + re-truncate is a bounded semilattice, so arrival
  * slicing cannot matter); state persists across batches. The batch
  * operator's DuckDB oracle covers the arithmetic; this suite covers
  * the state machine. */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4

  private def batchSnap(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val ds = KmvStream.keyedHashes(
        rs.toDF("event_type", "user_id"), "event_type", "user_id")
        .collect().map(_.h).toSeq.distinct.sorted.take(K)
      val est = if (ds.length < K) ds.length.toLong
        else (K - 1).toLong * KmvStream.HashSpan / math.max(ds.last, 1L)
      g -> ((ds.length.toLong, ds.lastOption.getOrElse(0L), est))
    }

  test("snapshots equal the batch sketch over each prefix; state " +
    "persists and re-truncates across micro-batches") {
    val ms = MemoryStream[(String, Long)](
      org.apache.spark.sql.Encoders.product[(String, Long)],
      spark.sqlContext)
    val hashes = KmvStream.keyedHashes(
      ms.toDF().toDF("event_type", "user_id"), "event_type", "user_id")
    val q = KmvStream.sketchStream(hashes, K).toDF()
      .writeStream.format("memory").queryName("kmv_snaps")
      .outputMode("append").start()
    try {
      val b1 = Seq(("click", 1L), ("click", 2L), ("view", 3L))
      val b2 = Seq(("click", 4L), ("click", 5L), ("click", 6L),
        ("click", 7L), ("view", 3L))
      ms.addData(b1: _*)
      q.processAllAvailable()
      val snap1 = spark.table("kmv_snaps")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(snap1 === batchSnap(b1))
      ms.addData(b2: _*)
      q.processAllAvailable()
      // latest snapshot per group = the one with the largest n_kept /
      // newest emission; read all rows and keep the last per group by
      // taking the batch-2 emission (memory sink appends in order)
      val allRows = spark.table("kmv_snaps")
        .as[(String, Long, Long, Long)].collect()
      val latest = allRows.zipWithIndex.groupBy(_._1._1)
        .map { case (g, rs) => g -> rs.maxBy(_._2)._1 }
        .map { case (g, r) => g -> ((r._2, r._3, r._4)) }
      assert(latest === batchSnap(b1 ++ b2))
      // the click sketch is FULL (k=4 < 6 distinct): the estimator
      // path engaged and the stored set really re-truncated
      assert(latest("click")._1 == K.toLong)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS kmv_snaps")
    }
  }
}
