package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Star
import graft.functions.GraftFunctions._

/** The reference's 15 DAX extracts re-expressed as declarative DataFrame
  * queries over the local star schema (SURVEY.md §2.1 S7, §2.4 A4–A6,
  * §2.2 P7–P11).
  *
  * The monthly workload is one shared shape instantiated 12 ways
  * (`ActDemandBlank.ps1`, `ACT_DemandNonBlank{1,2}.ps1`,
  * `FCST_DemandNonBlank{1..7}.ps1`, `FCST_DemandBlank.ps1`): filter the
  * SIOP fact on country-blankness (P7), `Cycle = "Current"`, a 9-BU
  * IN-list (P8) and a month window (P9), join the calendar dim (J12),
  * SUMMARIZE + SUM (A4), drop zero-measure rows (P10). The three
  * remaining scripts are the SUMMARIZECOLUMNS variants
  * (`BPC_VAD.ps1`, `BPCbySKU.ps1`) and the latest-snapshot TREATAS
  * queries (`ActUnknown.ps1`, `FcstUnknown.ps1`).
  *
  * All month windows are relative to an explicit `asOf` date — the
  * reference uses `TODAY()` (`ActDemandBlank.ps1:22`), which SURVEY §7.4
  * flags as the determinism risk.
  *
  * Scale: filters sit directly on the fact scan so Catalyst pushes them
  * into parquet; the calendar dim is tiny and broadcast; the aggregate is
  * a partial/final hash aggregate over the grouping keys — the only
  * shuffle in the plan, keyed on the group-by columns. The fact
  * derivation itself is session-cached ([[Star.siop]]) so the 12 window
  * instantiations share one materialization, mirroring the reference's
  * single shared Vertipaq model.
  */
object Extracts {

  /** The 9-BU IN-list from `ActDemandBlank.ps1:31`, mapped onto the
    * driver data's segment domain. */
  val BuSet: Seq[String] = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
  val BuSetSql: String = BuSet.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Month-window predicate in sargable form: the same window as the
    * month_key bounds, but on the RAW scan timestamp so parquet
    * row-group pruning applies (month_key is derived → not pushable).
    * `toM = None` is the open-ended ≥-window of
    * `FCST_DemandNonBlank7.ps1:24` / `FCST_DemandBlank.ps1:22`. */
  private def shipRange(asOf: String, fromM: Int, toM: Option[Int]): Column = {
    val base = to_date(lit(asOf))
    val lo = col("ship_ts") >=
      trunc(add_months(base, fromM), "month").cast("timestamp")
    toM.fold(lo)(t => lo &&
      col("ship_ts") < trunc(add_months(base, t), "month").cast("timestamp"))
  }

  /** The shared 12-script window-extract shape (see class doc).
    * `blankCountry` selects the ISBLANK vs NOT-ISBLANK dual (P7);
    * blank-country scripts also project the segment dim. */
  def windowedExtract(spark: SparkSession, dir: String,
      blankCountry: Boolean, fromMonths: Int, toMonths: Option[Int],
      asOf: String = Star.AsOf): DataFrame = {
    val base = to_date(lit(asOf))
    val countryPred =
      if (blankCountry) col("country").isNull || col("country") === ""
      else col("country").isNotNull && col("country") =!= ""
    val windowPred = toMonths.fold(
      col("month_key") >= monthKey(base, fromMonths))(t =>
      col("month_key") >= monthKey(base, fromMonths) &&
        col("month_key") < monthKey(base, t))
    val fact = Star.siop(spark, dir)
      .filter(countryPred &&                                       // P7
        col("cycle") === "Current" &&
        col("reltio_bu").isin(BuSet: _*) &&                        // P8
        windowPred &&                                              // P9
        shipRange(asOf, fromMonths, toMonths))      // sargable twin of P9
    val cal = broadcast(Star.calendar(spark, dir))
    val dims = Seq(col("planning_system"), col("material_id"),
      col("sales_organization"), col("reltio_bu"), col("country")) ++
      (if (blankCountry) Seq(col("segment")) else Nil) ++
      Seq(col("month_year"), col("month_sort"), col("fiscal_year"))
    fact.join(cal, fact("month_key") === cal("month_sort"))        // J12
      .groupBy(dims: _*)                                           // A4
      .agg(round(sum(col("siop_consensus")), 4).as("consensus"))
      .filter(col("consensus") =!= 0)                              // P10
  }

  /** ActDemandBlank (`ActDemandBlank.ps1:20-63`): blank-country actuals,
    * trailing-12-month window, grouped sum, non-zero rows only. */
  def actDemandBlank(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame =
    windowedExtract(spark, dir, blankCountry = true, -12, Some(0), asOf)

  /** FCST_DemandBlank (`FCST_DemandBlank.ps1:22-33`): the forecast-side
    * blank-country dual — open-ended window from the as-of month. */
  def fcstDemandBlank(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame =
    windowedExtract(spark, dir, blankCountry = true, 0, None, asOf)

  /** Shared non-blank window extract: the shape of ACT_DemandNonBlank1/2
    * (`ACT_DemandNonBlank1.ps1:24-35`, windows −6..0 and −12..−6) and
    * the seven FCST_DemandNonBlank scripts
    * (`FCST_DemandNonBlank1.ps1:23-33`, windows 0..+6 through ≥+36). */
  def demandWindow(spark: SparkSession, dir: String, fromMonths: Int,
      toMonths: Option[Int], asOf: String = Star.AsOf): DataFrame =
    windowedExtract(spark, dir, blankCountry = false, fromMonths, toMonths,
      asOf)

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

  /** FcstUnknown's TREATAS segment literal (`FcstUnknown.ps1:58`:
    * `{ "Unknown" }`), mapped onto the driver data's segment domain. */
  val UnknownSegment = "4-NOT SPECIFIED"
  /** FcstUnknown's fiscal-year TREATAS set — five consecutive fiscal
    * years, the reference's `{ 2025..2029 }` shape
    * (`FcstUnknown.ps1:52-55`) mapped into the generated date range. */
  val FcstFiscalYears: Seq[Int] = Seq(1998, 1999, 2000, 2001, 2002)

  /** FcstUnknown (`FcstUnknown.ps1:20-33,44-120`): the forecast-side
    * latest-snapshot variant. Differences from ActUnknown, per the DAX:
    * the snapshot scalar is the GLOBAL max (`CALCULATE(MAX, ALL(...))`,
    * `FcstUnknown.ps1:23-27`) rather than the max within filters; the
    * filter tables are non-zero non-blank consensus, months from the
    * as-of month forward, a fiscal-year IN-list, and one segment; and
    * the output is the SUMMARIZECOLUMNS detail grain (consensus itself
    * is a grouping column, measure = COUNTROWS) with the all-blank row
    * dropped (P11). */
  def fcstUnknown(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame = {
    val base = to_date(lit(asOf))
    val all = Star.siop(spark, dir)
    // ALL('SIOP'): the max snapshot over the UNFILTERED fact
    val maxSnap = all.agg(max(col("snapshot_date")).as("max_snap"))
    val fact = all.filter(
      col("siop_consensus") =!= 0 && col("siop_consensus").isNotNull &&
        col("segment") === UnknownSegment &&
        col("month_key") >= monthKey(base, 0) &&
        shipRange(asOf, 0, None))
    val cal = broadcast(Star.calendar(spark, dir)
      .filter(col("fiscal_year").isin(FcstFiscalYears: _*)))
    val grouped = fact
      .join(broadcast(maxSnap),
        fact("snapshot_date") === maxSnap("max_snap"))
      .join(cal, fact("month_key") === cal("month_sort"))
      .groupBy(col("country"), col("material_id"),
        col("sales_organization"), col("planning_system"),
        col("snapshot_date"), col("reltio_bu"),
        round(col("siop_consensus"), 2).as("consensus"),
        col("month_year"), col("month_sort"))
      .agg(count(lit(1)).as("n_rows"))                             // A14
    grouped.filter(Seq(col("country"), col("material_id"),         // P11
      col("sales_organization"), col("planning_system"),
      col("snapshot_date"), col("reltio_bu"), col("consensus"),
      col("month_year"), col("month_sort"))
      .map(_.isNotNull).reduce(_ || _))
  }
}
