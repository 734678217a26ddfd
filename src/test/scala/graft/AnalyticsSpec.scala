package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics

/** Invariant tests over the sf0.001 fixture (SURVEY §5's adopted
  * property style: conservation + partition checks). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("ABC: classes partition rows, cum_share monotone within brand") {
    val r = Analytics.abcClassification(spark, SfDir)
    assert(r.filter(!col("abc_class").isin("A", "B", "C")).count() == 0)
    val bad = r.filter(col("cum_share") > 1.0 + 1e-9).count()
    assert(bad == 0)
  }

  test("XYZ: cov = std/mean and classes cover all parts") {
    val r = Analytics.xyzClassification(spark, SfDir)
    assert(r.filter(col("xyz_class").isNull).count() == 0)
    val mism = r.filter(col("mean_qty") > 0 &&
      abs(col("cov") - round(col("std_qty") / col("mean_qty"), 6)) > 1e-6)
    assert(mism.count() == 0)
  }

  test("FCA: fca = 1 - abs_err_pct when demand > 0") {
    val r = Analytics.forecastAccuracy(spark, SfDir)
    val bad = r.filter(col("actual") =!= 0 &&
      abs(col("fca") - (lit(1.0) - col("abs_err_pct"))) > 1e-5).count()
    assert(bad == 0)
  }

  test("UOM conversion: converted * to_factor recovers qty") {
    val r = Analytics.uomConversion(spark, SfDir)
    val bad = r.filter(
      abs(col("converted_qty") * col("to_factor") - col("qty")) >
        col("qty") * 1e-4 + 1e-2).count()
    assert(bad == 0)
  }

  test("delta detect: self-delta is empty (upsert of unchanged data)") {
    val d = Analytics.deltaDetect(spark, SfDir, 1996, 1996)
    assert(d.count() == 0)
  }

  test("weekly disaggregation conserves monthly totals") {
    val r = Analytics.weeklyDisaggregation(spark, SfDir)
    val monthly = graft.core.Tables(spark, SfDir, "orders")
      .filter(year(col("o_orderdate")) === 1996)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("month_start"))
      .agg(round(sum(col("o_totalprice")), 2).as("month_total"))
    val bad = r.groupBy("month_start")
      .agg(sum(col("week_value")).as("wsum"))
      .join(monthly, "month_start")
      .filter(abs(col("wsum") - col("month_total")) > 0.01)
    assert(bad.count() == 0)
  }

  test("unpivot of pivot restores long-form totals (conservation)") {
    val wide = Analytics.pivotSum(spark, SfDir)
    val long = Analytics.unpivotSum(spark, SfDir)
    val wideSum = wide.select(
      Analytics.Segments.map(s => sum(col(s))).reduce(_ + _))
      .as[Double].head()
    val longSum = long.agg(sum("total")).as[Double].head()
    assert(math.abs(wideSum - longSum) < 1e-6)
  }

  test("running totals: last cumulative equals group total") {
    val r = Analytics.runningTotals(spark, SfDir)
    val byBu = r.groupBy("bu")
      .agg(max("cum_total").as("mx"), sum("total").as("tot"))
      .filter(abs(col("mx") - round(col("tot"), 2)) > 0.05)
    assert(byBu.count() == 0)
  }
}
