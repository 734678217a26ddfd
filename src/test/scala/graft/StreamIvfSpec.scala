package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.streaming.{StreamIvf, VersionedState}

/** X316 streaming leg: the IVF index fed by arrival micro-batches must
  * equal the one-shot assignment of everything seen (frozen quantizer
  * ⇒ per-row assignment commutes with batching), survive redelivery as
  * a no-op, and refuse to stream without a seeded quantizer. */
class StreamIvfSpec extends SparkSpec {
  import spark.implicits._

  test("streamed arrivals build the same index as one-shot assignment; " +
    "redelivered batch is a no-op; unseeded stream refuses") {
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val seedCorpus = emb.filter(col("vec_id") % 4 =!= 0)
    val arrivals = emb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("sivf_").toFile
    val target = new java.io.File(root, "index").getAbsolutePath
    // unseeded: the sink must refuse rather than train on a batch
    intercept[IllegalStateException] {
      StreamIvf.assign(emb.limit(1), target)
    }
    StreamIvf.seed(seedCorpus, target)
    assert(StreamIvf.currentVersion(spark, target) == 0L)
    val ms = MemoryStream[(Long, Seq[Double])](
      org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
      spark.sqlContext)
    val docs = ms.toDF().toDF("vec_id", "embedding")
    val q = StreamIvf.sink(docs, target)
      .option("checkpointLocation",
        new java.io.File(root, "ckpt").getAbsolutePath)
      .start()
    try {
      val (h1, h2) = arrivals.splitAt(arrivals.length / 2)
      ms.addData(h1); q.processAllAvailable()
      ms.addData(h2); q.processAllAvailable()
      // final stored index ≡ assigning the full corpus in one shot
      // against the same frozen centers
      val centers = Similarity.lloydCentersE6(seedCorpus, 16)
        .map(_.map(_.toDouble / 1000000.0))
      val want = Similarity.assignCells(emb, centers)
        .as[(Long, Long)].collect().toSet
      val stored = StreamIvf.current(spark, target).get
        .as[(Long, Long)].collect().toSet
      assert(stored == want)
      // replay guard: batch id 0 (committed as v1) applies no twice
      val v = StreamIvf.currentVersion(spark, target)
      assert(v == 2L)
      assert(!StreamIvf.applyBatch(
        h1.toDF("vec_id", "embedding"), id = 0L, target))
      assert(StreamIvf.currentVersion(spark, target) == v)
      // seeding again is a no-op (quantizer already committed)
      StreamIvf.seed(seedCorpus, target)
      assert(StreamIvf.currentVersion(spark, target) == v)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }
}
