package graft

import org.apache.spark.sql.functions._
import graft.load.Sinks

/** The co-located join contract: two tables bucketed on their join key
  * with the same bucket count join with NO Exchange on either side —
  * the scan itself carries the required distribution. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without any Exchange; " +
    "result is identical to the plain join") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bkt_spec_").toFile.getAbsolutePath
    val fact = (1L to 200L).map(i => (i, i % 37, i * 10)).toDF("id", "k", "v")
    val dim = (0L to 36L).map(k => (k, s"name$k")).toDF("dk", "nm")
    Sinks.writeBucketedTable(fact, "graft_spec_fact", s"$dir/f", "k", 4)
    Sinks.writeBucketedTable(dim, "graft_spec_dim", s"$dir/d", "dk", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_spec_fact")
        .join(spark.table("graft_spec_dim"), col("k") === col("dk"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"not SMJ:\n$p")
      assert(!p.contains("Exchange"), s"unexpected exchange:\n$p")
      // and the bucketed scan output matches the plain join
      val got = j.select(col("id"), col("nm")).as[(Long, String)]
        .collect().sortBy(_._1)
      val want = fact.join(dim, col("k") === col("dk"))
        .select(col("id"), col("nm")).as[(Long, String)]
        .collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_spec_fact")
      spark.sql("DROP TABLE IF EXISTS graft_spec_dim")
    }
  }

  test("fact-fact bucketed join + per-order rollup is Exchange-free " +
    "end to end (the j_bucketed_factfact shape)") {
    val (lineitemT, ordersT) =
      graft.registry.LoadQueries.bucketedFactTables(spark, SfDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at 100 TB neither fact side broadcasts — model that here
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.table(lineitemT)
        .join(spark.table(ordersT),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("ext_cents")).as("revenue_cents"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"not SMJ:\n$p")
      // the bucket distribution must carry through the join AND the
      // aggregate: no shuffle anywhere in the plan
      assert(!p.contains("Exchange"), s"unexpected exchange:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
