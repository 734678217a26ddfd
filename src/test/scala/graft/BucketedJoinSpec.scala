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
}
