package graft

import org.apache.spark.sql.functions._
import graft.core.Star
import graft.extract.Extracts

/** Extract-family invariants beyond the per-query oracle rows. */
class ExtractsSpec extends SparkSpec {
  import spark.implicits._

  test("extract queries reuse the session-cached fact (InMemoryTableScan)") {
    Star.siop(spark, SfDir).count() // materialize as the first query would
    val plan = Extracts.demandWindow(spark, SfDir, 0, Some(6))
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"window extract bypasses the star cache:\n$plan")
  }

  test("adjacent windows partition the full window (consensus conserved)") {
    def total(from: Int, to: Option[Int]): Double =
      Extracts.demandWindow(spark, SfDir, from, to)
        .agg(sum("consensus")).as[Double].head()
    val a = total(-12, Some(-6))
    val b = total(-6, Some(0))
    val full = total(-12, Some(0))
    // group keys include month_sort, so window slices are disjoint row
    // sets of the same aggregate — totals must add exactly
    assert(math.abs((a + b) - full) < 1e-6, s"$a + $b != $full")
  }

  test("blank/non-blank duals partition rows; P10 drops zero groups") {
    val blank = Extracts.windowedExtract(spark, SfDir,
      blankCountry = true, 0, Some(6))
    val nonblank = Extracts.demandWindow(spark, SfDir, 0, Some(6))
    // a country value can never appear on both sides
    val blankCountries = blank.select("country").distinct()
      .as[Option[String]].collect().toSet
    assert(blankCountries.forall(c => c.isEmpty || c.contains("")))
    assert(nonblank.filter(col("country").isNull || col("country") === "")
      .count() == 0)
    // P10: no zero-consensus group survives either side
    assert(blank.filter(col("consensus") === 0).count() == 0)
    assert(nonblank.filter(col("consensus") === 0).count() == 0)
  }

  test("fcstUnknown pins every row to the global latest snapshot") {
    val fu = Extracts.fcstUnknown(spark, SfDir)
    val globalMax = Star.siop(spark, SfDir)
      .agg(max("snapshot_date")).as[java.sql.Date].head()
    val snaps = fu.select("snapshot_date").distinct()
      .as[java.sql.Date].collect().toSeq
    assert(snaps.forall(_ == globalMax))
  }
}
