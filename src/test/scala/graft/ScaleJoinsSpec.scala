package graft

import org.apache.spark.sql.functions._
import graft.core.{ScaleJoins, Tables}

/** The 100-TB join answers, proven on small data: bucketed co-located
  * joins plan without exchanges; salted joins reproduce plain-join
  * results while splitting a hot key. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the fact join: no Exchange in plan") {
    val li = Tables(spark, SfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables(spark, SfDir, "orders")
      .select("o_orderkey", "o_orderdate")
    ScaleJoins.writeBucketedTable(li, "li_bkt", "l_orderkey", 8)
    ScaleJoins.writeBucketedTable(o, "o_bkt", "o_orderkey", 8)
    try {
      val j = spark.table("li_bkt").join(spark.table("o_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      // disable broadcast so the co-location (not size) decides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
        assert(j.count() == li.count()) // every lineitem has its order
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("salted join equals the plain join on a hot-key distribution") {
    // 1000 rows of one hot key + a long tail
    val skewed = (1 to 1200).map(i =>
      (if (i <= 1000) 1L else i.toLong, s"p$i")).toDF("k", "payload")
    val dim = (1L to 300L).map(k => (k, s"d$k")).toDF("k", "attr")
    val plain = skewed.join(dim, "k")
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val salted = ScaleJoins.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 1000)
  }

  test("bitmapPrunedJoin equals the plain join and prunes below the " +
    "join shuffle") {
    val fact = (1L to 2000L).map(k => (k, s"f$k")).toDF("k", "payload")
    val dim = (1L to 2000L).filter(_ % 100 == 0)
      .map(k => (k, s"d$k")).toDF("k", "attr")
    val plain = fact.join(dim, "k")
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val pruned = ScaleJoins.bitmapPrunedJoin(fact, dim, "k")
    assert(pruned.select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet == plain)
    assert(plain.size == 20)
    // the semi-prune is in the executed plan (broadcast LeftSemi on
    // the hashed bucket), upstream of the real equi-join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"prune vanished:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("NestedLoop"))
  }

  test("keySkewProfile: exact top-k shares via TakeOrdered, no full sort") {
    // key 1 owns half the rows; keys 51..100 one row each
    val df = (1 to 100).map(i => (if (i <= 50) 1L else i.toLong, i))
      .toDF("k", "x")
    val r = ScaleJoins.keySkewProfile(df, "k", topK = 3)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"global sort instead:\n$plan")
    val rows = r.orderBy("rk").as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.head == ((1L, 1L, 50L, 500000L)))
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    // ties broken by key: keys 51, 52 (count 1 each) follow the hot key
    assert(rows(1)._2 == 51L && rows(2)._2 == 52L)
  }
}
