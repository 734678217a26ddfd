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

  test("decode batch shape: batches bounded by DecodeBatchSize") {
    val batchSizes = Multimodal.mediaTable(spark, SfDir)
      .mapPartitions(it => it.grouped(Multimodal.DecodeBatchSize)
        .map(_.size))(org.apache.spark.sql.Encoders.scalaInt)
      .collect()
    assert(batchSizes.forall(_ <= Multimodal.DecodeBatchSize))
  }
}
