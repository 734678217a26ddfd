package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{StreamIngest, StreamingLogistic, StreamingTrainer}

/** The MLlib streaming consumer (reference `Dataset/stream.py:150-201`
  * producer contract; the trainer side is absent from the reference —
  * this is the engine's implementation of the implied consumer). */
class StreamingTrainerSpec extends SparkSpec {
  import spark.implicits._

  // deterministic well-mixed pseudo-random features with a fixed linear
  // truth (w = (0.8, -0.6), b = 0.1); training batches carry sparse
  // deterministic label noise, the holdout is the clean planted rule
  private def u(k: Long): Double = {
    var h = k * 2654435761L
    h ^= (h >>> 13)
    math.floorMod(h, 100003L) / 100003.0
  }

  private def rows(seed: Int, n: Int,
      noisy: Boolean): Seq[(Double, Double, Long)] =
    (0 until n).map { i =>
      val k = (seed * 1000L + i) * 2
      val f0 = u(k) * 4 - 2
      val f1 = u(k + 1) * 4 - 2
      val clean = if (0.8 * f0 - 0.6 * f1 + 0.1 > 0) 1L else 0L
      val label =
        if (noisy && (seed * 1000 + i) % 13 == 0) 1L - clean else clean
      (f0, f1, label)
    }

  private def payloadJson(seed: Int, n: Int): String =
    rows(seed, n, noisy = true).zipWithIndex.map { case ((f0, f1, l), i) =>
      s""""$i": {"feature0": $f0, "feature1": $f1, "label": $l}"""
    }.mkString("{", ", ", "}")

  test("foreachBatch MLlib trainer converges across micro-batches") {
    val inner = StreamIngest.featureSchema(2, withLabel = true)
    val holdout = rows(99, 400, noisy = false)
      .toDF("feature0", "feature1", "label")
    val trainer = new StreamingLogistic(nFeatures = 2)
    val ms = MemoryStream[String](
      org.apache.spark.sql.Encoders.STRING, spark.sqlContext)
    val parsed = StreamIngest.parsePayload(ms.toDF().toDF("value"), inner)
    val q = trainer.writer(parsed)
      .trigger(Trigger.ProcessingTime("10 milliseconds")).start()
    val accs = scala.collection.mutable.Buffer[Double]()
    try {
      (1 to 3).foreach { b =>
        ms.addData(payloadJson(b, 150))
        q.processAllAvailable()
        assert(trainer.batchCount == b) // one model update per micro-batch
        accs += trainer.evaluate(holdout)._2
      }
    } finally q.stop()
    // clean-holdout accuracy must improve monotonically as the window
    // accumulates evidence, and end high
    accs.indices.drop(1).foreach { i =>
      assert(accs(i) >= accs(i - 1) - 0.005, s"accuracy regressed: $accs")
    }
    assert(accs.last >= 0.94, s"final accuracy ${accs.last} too low")
    // the learned direction matches the planted truth's signs
    val w = trainer.coefficients
    assert(w(0) > 0 && w(1) < 0)
  }

  test("local and distributed fit paths converge to the same model") {
    val data = rows(7, 600, noisy = true)
      .map { case (f0, f1, l) => (Array(f0, f1), l.toDouble) }.toArray
    val local = new StreamingLogistic(nFeatures = 2) // local path (600 rows)
    local.updateOnRows(spark, data)
    val dist = new StreamingLogistic(nFeatures = 2, localFitMaxRows = 0)
    dist.updateOnRows(spark, data) // forced through MLlib LBFGS
    assert(dist.batchCount == 1 && local.batchCount == 1)
    // same objective, same tol: coefficients agree to optimizer noise
    local.coefficients.zip(dist.coefficients).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.05, s"coef drift: $a vs $b")
    }
    assert(math.abs(local.intercept - dist.intercept) < 0.05)
  }

  test("batch-mode events trainer emits an improving metric trajectory") {
    val m = StreamingTrainer.trainOnEvents(spark, SfDir, batchSize = 200)
      .orderBy("batch_id")
      .select($"batch_id", $"log_loss", $"accuracy")
      .as[(Long, Double, Double)].collect()
    assert(m.length >= 2)
    assert(m.last._3 >= m.head._3 - 0.005,
      s"accuracy regressed: ${m.map(_._3).toSeq}")
    assert(m.last._3 >= 0.9, s"final accuracy ${m.last._3} too low")
  }

  test("final_loss_e6 curve replays to EXACT integers from the frozen " +
    "weights and the raw events table (r12 verdict #8)") {
    val bs = 200
    val (df, trainer) =
      StreamingTrainer.trainOnEventsWithModel(spark, SfDir, batchSize = bs)
    val got = df.select($"batch_id", $"n_rows", $"final_loss_e6")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty)
    // independent scalar re-derivation: featurization, batching,
    // margin, stable log-loss, micro-nat quantization and the integer
    // mean are all recomputed from the RAW events table with plain
    // java.lang.Math — any wiring drift in the distributed path
    // (column order, cast, quantization spelling) breaks equality
    val w = trainer.coefficients
    val b = trainer.intercept
    val want = graft.core.Tables(spark, SfDir, "events")
      .select($"event_id", $"user_id", $"value")
      .as[(Long, Long, Double)].collect()
      .map { case (id, uid, v) =>
        val f1 = (uid % 97).toDouble
        ((id.toDouble / bs).toLong, v, f1,
          if (v * 3 - f1 > 0.0) 1.0 else 0.0)
      }
      .filter(_._1 < 5)
      .groupBy(_._1)
      .map { case (bId, rs) =>
        val losses = rs.map { case (_, f0, f1, y) =>
          val m = w(0) * f0 + w(1) * f1 + b
          val loss = math.max(m, 0.0) - y * m +
            math.log1p(math.exp(-math.abs(m)))
          math.floor(loss * 1e6 + 0.5).toLong
        }
        bId -> ((rs.length.toLong, losses.sum / rs.length))
      }
    assert(got === want)
  }
}
