package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDedup

/** The streaming arrival-time dedup sink: per-batch decisions append
  * as atomic segments, keepers index the corpus for later batches,
  * and redelivered batch ids are no-ops (the same flagging logic is
  * oracle-checked batch-side by dedup_incremental). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again"

  test("doc stream → decision ledger; dups flag against EARLIER " +
    "batches; replayed batches are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("sdedup_").toFile
    val target = new java.io.File(root, "ledger").getAbsolutePath
    val ms = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)],
      spark.sqlContext)
    val docs = ms.toDF().toDF("doc_id", "text")
    val q = StreamDedup.sink(docs, target)
      .option("checkpointLocation",
        new java.io.File(root, "ckpt").getAbsolutePath)
      .start()
    try {
      // batch 0: empty index — both docs pass as novel keepers
      ms.addData((1L, base),
        (2L, "completely different content about spark streaming"))
      q.processAllAvailable()
      // batch 1: 10 duplicates doc 1; 11 is genuinely new
      ms.addData((10L, base),
        (11L, "unrelated novel text nothing shared here with anything"))
      q.processAllAvailable()

      def led = StreamDedup.ledger(spark, target).get
        .select($"doc_id", $"is_dup",
          coalesce($"dup_of", lit(-1L)).as("dup_of"), $"batch_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = Set(
        (1L, 0L, -1L, 0L), (2L, 0L, -1L, 0L),
        (10L, 1L, 1L, 1L), (11L, 0L, -1L, 1L))
      assert(led == want)
      // keepers carry signatures; dups don't
      val sigs = StreamDedup.ledger(spark, target).get
        .select($"doc_id", $"sig".isNotNull).as[(Long, Boolean)]
        .collect().toMap
      assert(sigs == Map(1L -> true, 2L -> true, 10L -> false,
        11L -> true))
      // redelivery of a committed id changes nothing
      val replay = Seq((99L, base)).toDF("doc_id", "text")
      assert(!StreamDedup.mergeBatch(replay, 1L, target))
      assert(led == want)
      assert(StreamDedup.maxSegment(spark, target) == 1L)
      // a NEW id flags against the accumulated keeper index
      assert(StreamDedup.mergeBatch(replay, 5L, target))
      assert(led.contains((99L, 1L, 1L, 5L)))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }
}
