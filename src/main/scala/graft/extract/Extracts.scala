package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Star, Tables}
import graft.functions.GraftFunctions._

/** The reference's 15 DAX extracts re-expressed as declarative DataFrame
  * queries over the local star schema (SURVEY.md §2.1 S7, §2.4 A4–A6,
  * §2.2 P7–P11).
  *
  * All month windows are relative to an explicit `asOf` date — the
  * reference uses `TODAY()` (`ActDemandBlank.ps1:22`), which SURVEY §7.4
  * flags as the determinism risk.
  *
  * Scale: filters sit directly on the fact scan so Catalyst pushes them
  * into parquet; the calendar dim is tiny and broadcast; the aggregate is
  * a partial/final hash aggregate over the grouping keys — the only
  * shuffle in the plan, keyed on the group-by columns.
  */
object Extracts {

  /** The 9-BU IN-list from `ActDemandBlank.ps1:31`, mapped onto the
    * driver data's segment domain. */
  val BuSet: Seq[String] = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
  val BuSetSql: String = BuSet.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Month-window predicate in sargable form: the same window as the
    * month_key bounds, but on the RAW scan timestamp so parquet
    * row-group pruning applies (month_key is derived → not pushable). */
  private def shipRange(asOf: String, fromM: Int, toM: Int) = {
    val base = to_date(lit(asOf))
    col("ship_ts") >= trunc(add_months(base, fromM), "month")
      .cast("timestamp") &&
      col("ship_ts") < trunc(add_months(base, toM), "month")
        .cast("timestamp")
  }

  /** ActDemandBlank (`ActDemandBlank.ps1:20-63`): blank-country actuals,
    * trailing-12-month window, grouped sum, non-zero rows only. */
  def actDemandBlank(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame = {
    val lo = monthKey(to_date(lit(asOf)), -12)
    val hi = monthKey(to_date(lit(asOf)), 0)
    val fact = Star.siop(spark, dir)
      .filter((col("country").isNull || col("country") === "") &&  // P7
        col("cycle") === "Current" &&
        col("reltio_bu").isin(BuSet: _*) &&                        // P8
        col("month_key") >= lo && col("month_key") < hi &&         // P9
        shipRange(asOf, -12, 0))                    // sargable twin of P9
    val cal = broadcast(Star.calendar(spark, dir))
    fact.join(cal, fact("month_key") === cal("month_sort"))        // J12
      .groupBy(col("planning_system"), col("material_id"),         // A4
        col("sales_organization"), col("reltio_bu"), col("country"),
        col("segment"), col("month_year"), col("month_sort"),
        col("fiscal_year"))
      .agg(round(sum(col("siop_consensus")), 4).as("consensus"))
      .filter(col("consensus") =!= 0)                              // P10
  }

  /** Shared DAX-window extract: non-blank country, parameterized month
    * window — the shape of ACT_DemandNonBlank1/2 and the seven
    * FCST_DemandNonBlank scripts (`FCST_DemandNonBlank1.ps1:23-33`). */
  def demandWindow(spark: SparkSession, dir: String, fromMonths: Int,
      toMonths: Int, asOf: String = Star.AsOf): DataFrame = {
    val lo = monthKey(to_date(lit(asOf)), fromMonths)
    val hi = monthKey(to_date(lit(asOf)), toMonths)
    val fact = Star.siop(spark, dir)
      .filter(col("country").isNotNull && col("country") =!= "" &&
        col("reltio_bu").isin(BuSet: _*) &&
        col("month_key") >= lo && col("month_key") < hi &&
        shipRange(asOf, fromMonths, toMonths))
    val cal = broadcast(Star.calendar(spark, dir))
    fact.join(cal, fact("month_key") === cal("month_sort"))
      .groupBy(col("planning_system"), col("material_id"),
        col("sales_organization"), col("reltio_bu"), col("country"),
        col("month_year"), col("month_sort"), col("fiscal_year"))
      .agg(round(sum(col("siop_consensus")), 4).as("consensus"))
      .filter(col("consensus") =!= 0)
  }

  /** BPC_VAD (`BPC_VAD.ps1:64-80`): SUMMARIZECOLUMNS + measure with
    * NOT-IN exclusion incl. blanks, all-blank result rows dropped (P11). */
  def bpcVad(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Seq("FURNITURE")
    Star.siop(spark, dir)
      .filter(col("reltio_bu").isNull ||
        !col("reltio_bu").isin(excluded: _*))
      .groupBy(col("reltio_bu"), col("country"), col("segment"))
      .agg(round(sum(col("siop_consensus")), 4).as("actual_units"),
        count(lit(1)).as("n_rows"))                                // A14
      .filter(Seq(col("reltio_bu"), col("country"), col("segment"))
        .map(_.isNotNull).reduce(_ || _))                          // P11
  }

  /** BPCbySKU (`BPCbySKU.ps1:89-121`): ROLLUPADDISSUBTOTAL with a
    * grand-total flag via grouping_id (A6). */
  def bpcBySku(spark: SparkSession, dir: String): DataFrame =
    Star.siop(spark, dir)
      .rollup(col("reltio_bu"), col("country"))
      .agg(round(sum(col("siop_consensus")), 4).as("units"),
        grouping_id().cast("long").as("is_total"))

  /** ActUnknown (`ActUnknown.ps1:61-94`): latest snapshot within a
    * filtered window (A9, the DAX MAX + TREATAS pattern), then the
    * grouped measure at that snapshot only. The scalar max is a 1-row
    * aggregate broadcast back against the fact — never a global window
    * (which would serialize the whole fact through one partition). */
  def actUnknown(spark: SparkSession, dir: String): DataFrame = {
    val fact = Star.siop(spark, dir)
      .filter(col("reltio_bu").isin(BuSet: _*) &&
        col("siop_consensus") =!= 0)
    val maxSnap = fact.agg(max(col("snapshot_date")).as("max_snap"))
    fact.join(broadcast(maxSnap),
        fact("snapshot_date") === maxSnap("max_snap"))
      .groupBy(col("reltio_bu"), col("segment"), col("snapshot_date"))
      .agg(round(sum(col("siop_consensus")), 4).as("units"),
        count(lit(1)).as("n_rows"))
  }
}
