package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, SfDir)
    val r = m.toDF().select(col("doc_id"), length(col("payload")).as("n"),
      col("width"), col("height")).limit(5).collect()
    assert(r.nonEmpty && r.forall(_.getInt(2) > 0))
  }

  test("stub decode: histogram bins sum to n_bytes; ASCII payload mean") {
    val f = Multimodal.mediaFeatures(spark, SfDir)
    val bad = f.filter(
      col("hist_0") + col("hist_1") + col("hist_2") + col("hist_3")
        =!= col("n_bytes")).count()
    assert(bad == 0)
    // ASCII text: every byte < 128 → hist_2/hist_3 empty
    assert(f.filter(col("hist_2") + col("hist_3") > 0).count() == 0)
  }

  test("frame sampling: correct grid, full frames, every-kth kept") {
    val f = Multimodal.sampleFrames(spark, SfDir)
    import spark.implicits._
    val rows = f.select("doc_id", "frame_index", "n_bytes")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // only every-kth frame index survives
    assert(rows.forall(_._2 % Multimodal.FrameEvery == 0))
    // all but a document's last sampled frame are exactly FrameBytes
    val lastIdx = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
    rows.foreach { case (d, i, n) =>
      if (i < lastIdx(d)) assert(n == Multimodal.FrameBytes)
      else assert(n > 0 && n <= Multimodal.FrameBytes)
    }
    // sampling with every=1 reconstructs the payload byte count
    val total = Multimodal.sampleFrames(spark, SfDir, every = 1)
      .groupBy(col("doc_id")).agg(sum("n_bytes").as("nb"))
    val src = Multimodal.mediaTable(spark, SfDir).toDF()
      .select(col("doc_id"), length(col("payload")).cast("long").as("pb"))
    assert(total.join(src, "doc_id")
      .filter(col("nb") =!= col("pb")).count() == 0)
  }

  test("decodePcm16: known waveform incl. negative samples and odd tail") {
    // bytes: [0x00,0x01] -> 256; [0xFF,0xFF] -> -1; [0x10,0x80] -> -32752;
    // trailing odd byte dropped
    val payload = Array[Byte](0x00, 0x01, 0xFF.toByte, 0xFF.toByte,
      0x10, 0x80.toByte, 0x7F)
    val r = Multimodal.decodePcm16(Seq(
      Multimodal.MediaRecord(1L, "audio/pcm", payload, 1, 1))).head
    assert(r.n_samples == 3)
    assert(r.peak == 32752L)
    assert(r.zero_cross == 1L) // 256 -> -1 flips; -1 -> -32752 doesn't
    val expectRms =
      math.sqrt((256L * 256 + 1 + 32752L * 32752).toDouble / 3)
    assert(math.abs(r.rms - expectRms) < 1e-9)
    // empty/1-byte payload yields no row, not a crash
    assert(Multimodal.decodePcm16(Seq(
      Multimodal.MediaRecord(2L, "audio/pcm", Array[Byte](1), 1, 1))).isEmpty)
  }

  test("decode batch shape: batches bounded by DecodeBatchSize") {
    val batchSizes = Multimodal.mediaTable(spark, SfDir)
      .mapPartitions(it => it.grouped(Multimodal.DecodeBatchSize)
        .map(_.size))(org.apache.spark.sql.Encoders.scalaInt)
      .collect()
    assert(batchSizes.forall(_ <= Multimodal.DecodeBatchSize))
  }
}
