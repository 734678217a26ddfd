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

  /** End-to-end flagship pipeline (SURVEY §7.2): ActDemandBlank extract
    * -> canonical 8-column output, dispatched through the config-driven
    * [[Runner]] (the `use_mapping=True` job of `runner.py:25-38`). */
  def actDemandBlankFinal(spark: SparkSession, dir: String,
      asOf: String = Star.AsOf): DataFrame =
    Runner.runJob(spark, dir, Runner.jobs("act_blank"), asOf)
}
