package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** The optimizer rule must (1) fire on the naive theta-join shape and
  * kill the nested loop, (2) be result-identical to the un-rewritten
  * join, (3) leave pre-bucketed / non-matching joins alone, (4) raise
  * on intervals wide enough to explode one task. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int, h: Int = 0) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  private def points = Seq(
    (1L, 10L, ts(1)), (2L, 10L, ts(2, 12)), (3L, 10L, ts(5)),
    (4L, 20L, ts(2)), (5L, 20L, ts(9)), (6L, 30L, ts(3)))
    .toDF("event_id", "user_id", "ts")

  private def intervals = Seq(
    (10L, ts(1), ts(3), 100L),   // catches events 1, 2
    (10L, ts(4), ts(6), 101L),   // catches event 3
    (20L, ts(8), ts(10), 102L),  // catches event 5
    (30L, ts(5), ts(4), 103L))   // dirty: end < start, matches nothing
    .toDF("m_user_id", "m_start", "m_end", "m_event_id")

  private def naive(p: DataFrame, i: DataFrame): DataFrame =
    p.join(i, col("user_id") === col("m_user_id") &&
      col("ts") >= col("m_start") && col("ts") <= col("m_end"))

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try body finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    }
  }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrites the naive theta join: no nested loop, same rows") {
    val expected = naive(points, intervals)
      .select("event_id", "m_event_id").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(expected == Seq((1L, 100L), (2L, 100L), (3L, 101L), (5L, 102L)))
    withRule {
      val df = naive(points, intervals)
      val plan = planString(df)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived the rewrite:\n$plan")
      assert(plan.contains("Generate"), s"no bucket explode in:\n$plan")
      val got = df.select("event_id", "m_event_id").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("null keys and null bounds drop out exactly like the naive join") {
    val p = Seq((1L, Some(10L), Some(ts(2))), (2L, None, Some(ts(2))),
      (3L, Some(10L), None))
      .toDF("event_id", "user_id", "ts")
    val i = Seq((Some(10L), Some(ts(1)), Some(ts(3)), 100L),
      (Some(10L), None, Some(ts(3)), 101L))
      .toDF("m_user_id", "m_start", "m_end", "m_event_id")
    val expected = naive(p, i).select("event_id", "m_event_id")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(expected == Seq((1L, 100L)))
    withRule {
      val got = naive(p, i).select("event_id", "m_event_id")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("does not re-fire on the library's pre-bucketed operator") {
    withRule {
      val i = intervals.withColumnRenamed("m_user_id", "user_id")
      val df = graft.operators.RangeJoin.pointInRange(points, i,
        Seq("user_id"), "ts", "m_start", "m_end")
      // exactly ONE Generate: the operator's own explode, not a second
      // one stacked by the rule (the __-prefix guard)
      val n = df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size
      assert(n == 1, s"rule re-fired on the pre-bucketed join ($n Generates)")
      assert(df.count() == 4)
    }
  }

  test("interval overlap joins (no single point column) are left alone") {
    withRule {
      val a = Seq((10L, ts(1), ts(3))).toDF("k", "a_start", "a_end")
      val b = Seq((10L, ts(2), ts(4))).toDF("k2", "b_start", "b_end")
      val df = a.join(b, col("k") === col("k2") &&
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      val gens = df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      assert(gens.isEmpty, "rule fired on an overlap join it cannot bucket")
      assert(df.count() == 1)
    }
  }

  test("fires with reversed operands and the points side on the right") {
    val expected = naive(points, intervals)
      .select("event_id", "m_event_id").as[(Long, Long)]
      .collect().sorted.toSeq
    withRule {
      // m_start <= ts AND m_end >= ts, intervals JOIN points
      val df = intervals.join(points,
        col("m_user_id") === col("user_id") &&
          col("m_start") <= col("ts") && col("m_end") >= col("ts"))
      val plan = planString(df)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"nested loop survived the reversed form:\n$plan")
      val got = df.select("event_id", "m_event_id").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got == expected)
    }
  }

  test("rule injected via spark.sql.extensions fires in SQL") {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new graft.functions.GraftExtensions)
      .create()
    try {
      // rebuild the inputs as views owned by the new session
      import scala.jdk.CollectionConverters._
      s2.createDataFrame(points.collect().toList.asJava, points.schema)
        .createOrReplaceTempView("rj_points")
      s2.createDataFrame(intervals.collect().toList.asJava, intervals.schema)
        .createOrReplaceTempView("rj_intervals")
      val df = s2.sql(
        """SELECT event_id, m_event_id FROM rj_points p JOIN rj_intervals i
          |ON p.user_id = i.m_user_id
          |AND p.ts BETWEEN i.m_start AND i.m_end""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"extension rule not applied:\n$plan")
      assert(df.count() == 4)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("an interval spanning too many buckets raises, not OOMs") {
    withRule {
      spark.conf.set(RangeJoinRewrite.MaxBucketsKey, "10")
      try {
        val i = Seq((10L, ts(1), Timestamp.valueOf("2024-03-01 00:00:00"),
          100L)).toDF("m_user_id", "m_start", "m_end", "m_event_id")
        val ex = intercept[Exception] { naive(points, i).count() }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(ex).exists(_.contains("rangeJoinRewrite")),
          s"wrong error: $ex")
      } finally spark.conf.unset(RangeJoinRewrite.MaxBucketsKey)
    }
  }
}
