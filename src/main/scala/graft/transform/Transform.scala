package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Star, Tables}
import graft.functions.GraftFunctions._

/** The reference's canonical 8-column transform (`pipeline/lib.py:210-298`
  * `transform_to_final`): mapping-enrichment join (J1), first-of-month
  * snapshot stamp (F13 as a date), attribute month parse (F14), blank-BU
  * rewrite (F9), final projection (P1).
  *
  * Output schema is snake_case (`source, snapshot, material,
  * sales_organization, country, attribute, value, bu`) — the reference's
  * spaced names (`"Sales Organization"`) are a CSV-header concern, not a
  * semantic one.
  */
object Transform {

  /** The key/corrected-country mapping of `lib.py:188-207`, derived from
    * supplier⋈nation (FIXTURES.md §3): supplier's own nation is the
    * corrected country for its sales org. Dimension-sized -> broadcast. */
  def salesOrgMapping(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "supplier")
    val n = Tables(spark, dir, "nation")
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .select(s("s_suppkey").cast("string").as("map_sales_org"),
        n("n_name").as("corrected_country"))
  }

  /** `transform_to_final` over an extract result: J1 mapping merge with
    * conditional country overwrite, then the canonical projection. */
  def toFinal(extract: DataFrame, mapping: DataFrame, source: String,
      asOf: String): DataFrame = {
    val m = broadcast(mapping)
    extract.join(m, extract("sales_organization") === m("map_sales_org"),
        "left")                                                     // J1
      .select(
        coalesce(col("planning_system"), lit(source)).as("source"),
        trunc(to_date(lit(asOf)), "month").as("snapshot"),          // F13
        col("material_id").as("material"),
        col("sales_organization"),
        when(col("country").isNull || col("country") === "",
          col("corrected_country")).otherwise(col("country"))
          .as("country"),
        // attribute = first-of-month of the measured month (F14: the
        // extract's month_sort is already the parsed yyyymm key)
        to_date(concat(col("month_sort").cast("string"), lit("01")),
          "yyyyMMdd").as("attribute"),
        col("consensus").as("value"),
        blankBuRewrite(col("reltio_bu")).as("bu"))                  // F9
  }

  /** End-to-end flagship pipeline (SURVEY §7.2): ActDemandBlank extract
    * -> canonical 8-column output. */
  def actDemandBlankFinal(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame =
    toFinal(graft.extract.Extracts.actDemandBlank(spark, dir, asOf),
      salesOrgMapping(spark, dir), "SIOP", asOf)
}
