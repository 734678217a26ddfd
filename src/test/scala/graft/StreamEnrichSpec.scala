package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamJoins

/** X230: stream-static enrichment — the per-micro-batch dimension
  * lookup. The contract under test: the static side broadcasts, LEFT
  * semantics never drop an event, `is_enriched` carries the guarded-
  * lookup verdict, and the streamed result row-equals the batch
  * mirror of the same expression. */
case class EnrichEv(key: Long, amount: Long)

class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._
  private type Ev = EnrichEv
  private val Ev = EnrichEv

  test("stream-static enrich: streamed micro-batches row-equal the " +
    "batch mirror, unknown keys kept with is_enriched = 0") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = Seq((1L, "gold"), (2L, "silver"), (9L, "unseen"))
      .toDF("key", "tier")
    val ms = MemoryStream[Ev](
      org.apache.spark.sql.Encoders.product[Ev], spark.sqlContext)
    val q = StreamJoins.enrich(ms.toDS().toDF(), dim, "key")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      ms.addData(Ev(1L, 10L), Ev(3L, 30L)) // 3 is not in the dim
      q.processAllAvailable()
      ms.addData(Ev(2L, 20L), Ev(1L, 11L)) // second batch re-broadcasts
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select($"key", $"amount", $"tier", $"is_enriched")
        .as[(Long, Long, Option[String], Long)].collect().toSet
      val batch = Seq(Ev(1L, 10L), Ev(3L, 30L), Ev(2L, 20L), Ev(1L, 11L))
        .toDF()
      val mirror = StreamJoins.enrich(batch, dim, "key")
        .select($"key", $"amount", $"tier", $"is_enriched")
        .as[(Long, Long, Option[String], Long)].collect().toSet
      assert(got == mirror)
      assert(got.contains((3L, 30L, None, 0L)), "unknown key dropped")
      assert(got.contains((1L, 10L, Some("gold"), 1L)))
      assert(got.size == 4)
    } finally q.stop()
  }

  test("enrich plans the static side as a broadcast join") {
    val dim = Seq((1L, "gold")).toDF("key", "tier")
    val fact = Seq((1L, 10L), (2L, 5L)).toDF("key", "amount")
    val plan = StreamJoins.enrich(fact, dim, "key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }
}
