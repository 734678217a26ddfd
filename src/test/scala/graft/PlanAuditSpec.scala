package graft

import org.apache.spark.sql.DataFrame
import graft.core.Tables

/** Plan-shape assertions for the round-3 operators: the scale claims in
  * the scaladocs (one exchange, broadcast small sides, no nested loop)
  * checked against the actual physical plan, not just prose. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("asOf plans ONE shuffle (the keyed window) and no join at all") {
    val p = plan(SparkEntry.queries("asof_last_milestone")(spark, SfDir))
    // probe∪build sort under one hashpartitioning exchange; the
    // milestone pre-aggregate adds its own exchange upstream — but no
    // join operator and no range/nested-loop anywhere
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(p.contains("Window"), s"missing window:\n$p")
  }

  test("range join is a hash equi-join, never a nested loop") {
    val p = plan(SparkEntry.queries("events_range_join")(spark, SfDir))
    assert(!p.contains("NestedLoop"), s"nested loop:\n$p")
    assert(p.contains("Join"), s"missing join:\n$p")
  }

  test("decontaminate broadcasts the benchmark side only") {
    val p = plan(SparkEntry.queries("pipe_decontaminate")(spark, SfDir))
    assert(count(p, "BroadcastExchange") == 1, s"broadcast count:\n$p")
    graft.core.CacheBay.drain()
  }

  test("bm25 broadcasts df + corpus stats; corpus side never broadcast") {
    val p = plan(SparkEntry.queries("text_bm25")(spark, SfDir))
    // df-per-term and the 1-row stats frame: exactly two broadcasts
    assert(count(p, "BroadcastExchange") == 2, s"broadcast count:\n$p")
    graft.core.CacheBay.drain()
  }
}
