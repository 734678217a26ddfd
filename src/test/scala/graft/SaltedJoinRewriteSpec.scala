package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.SaltedJoinRewrite

/** X318: the salted-join rewrite must (1) fire on a registered-hot-key
  * equi-join and produce EXACTLY the plain join's rows, (2) not fire
  * without a registration or on a uniform profile, (3) leave its own
  * output alone (fixed point), (4) clear its registration confs after
  * the driver face. */
class SaltedJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // 300 rows on key 1 (the hot key), 100 spread over keys 2..51
  private def skewed = (1 to 400)
    .map(i => (if (i <= 300) 1L else (i % 50) + 2L, i.toLong))
    .toDF("k", "payload")

  private def dim = (1 to 60).map(i => (i.toLong, s"d$i")).toDF("k", "name")

  private def withSalt[T](keyCol: String, hot: Seq[String],
      salts: Int = 4)(body: => T): T = {
    spark.conf.set(SaltedJoinRewrite.EnabledKey, "true")
    spark.conf.set(SaltedJoinRewrite.SaltsKey, salts.toString)
    spark.conf.set(SaltedJoinRewrite.HotKeysPrefix + keyCol,
      hot.mkString(","))
    try body finally {
      spark.conf.unset(SaltedJoinRewrite.HotKeysPrefix + keyCol)
      spark.conf.unset(SaltedJoinRewrite.SaltsKey)
      spark.conf.unset(SaltedJoinRewrite.EnabledKey)
    }
  }

  private def rows(df: DataFrame): Seq[(Long, Long, String)] =
    df.select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("fires on the registered hot key and is result-identical") {
    val expected = rows(skewed.join(dim, Seq("k")))
    assert(expected.size == 400) // every left row matches exactly once
    withSalt("k", Seq("1")) {
      val df = skewed.join(dim, Seq("k"))
      val plan = optimized(df)
      assert(plan.contains("__graft_salt"), s"rewrite did not fire:\n$plan")
      assert(plan.contains("explode"), s"no replication explode in:\n$plan")
      assert(rows(df) == expected)
    }
  }

  test("string keys: hot key registered as text, cast to the key type") {
    val l = Seq(("hot", 1L), ("hot", 2L), ("hot", 3L), ("cold", 4L))
      .toDF("k", "payload")
    val r = Seq(("hot", "H"), ("cold", "C")).toDF("k", "name")
    val expected = l.join(r, Seq("k")).select("k", "payload", "name")
      .as[(String, Long, String)].collect().sorted.toSeq
    withSalt("k", Seq("hot")) {
      val df = l.join(r, Seq("k"))
      assert(optimized(df).contains("__graft_salt"))
      val got = df.select("k", "payload", "name")
        .as[(String, Long, String)].collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("null keys drop out exactly like the plain join") {
    val l = Seq((Some(1L), 10L), (None, 11L), (Some(2L), 12L))
      .toDF("k", "payload")
    val r = Seq((Some(1L), "a"), (None, "x"), (Some(2L), "b"))
      .toDF("k", "name")
    val expected = l.join(r, Seq("k")).select("payload", "name")
      .as[(Long, String)].collect().sorted.toSeq
    assert(expected == Seq((10L, "a"), (12L, "b")))
    withSalt("k", Seq("1")) {
      val got = l.join(r, Seq("k")).select("payload", "name")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("does not fire without a registration (enabled but no hot keys)") {
    spark.conf.set(SaltedJoinRewrite.EnabledKey, "true")
    try {
      val plan = optimized(skewed.join(dim, Seq("k")))
      assert(!plan.contains("__graft_salt"), s"fired with no profile:\n$plan")
    } finally spark.conf.unset(SaltedJoinRewrite.EnabledKey)
  }

  test("autoSaltedJoin: fires on the skewed fixture, clears its confs") {
    val expected = rows(skewed.join(dim, Seq("k")))
    val df = graft.core.ScaleJoins.autoSaltedJoin(skewed, dim, "k")
    // key 1 holds 75% — far past the 5% bar — so the rewrite fired
    assert(optimized(df).contains("__graft_salt"))
    assert(rows(df) == expected)
    // registration hygiene: nothing lingers in the session
    assert(spark.conf.getOption(SaltedJoinRewrite.EnabledKey).isEmpty)
    assert(spark.conf.getOption(
      SaltedJoinRewrite.HotKeysPrefix + "k").isEmpty)
    // and a FRESH plain join after the face is un-rewritten
    assert(!optimized(skewed.join(dim, Seq("k"))).contains("__graft_salt"))
  }

  test("autoSaltedJoin: does NOT fire on a uniform profile") {
    val uniform = (1 to 600).map(i => ((i % 60).toLong + 1L, i.toLong))
      .toDF("k", "payload")
    val df = graft.core.ScaleJoins.autoSaltedJoin(uniform, dim, "k")
    assert(!optimized(df).contains("__graft_salt"),
      "uniform keys (max share ~1.7%) must stay a plain join")
    assert(df.count() == 600)
  }

  test("fixed point: the rewritten join's salt columns block a re-fire") {
    withSalt("k", Seq("1")) {
      val plan = optimized(skewed.join(dim, Seq("k")))
      // exactly one replication explode — a re-fire would add another
      assert("explode".r.findAllIn(plan).size == 1, plan)
    }
  }
}
