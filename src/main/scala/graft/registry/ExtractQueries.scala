package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Star
import graft.extract.Extracts
import graft.transform.Transform

/** Driver-contract registry for the DAX-extract family (SURVEY §2.1 S7,
  * §2.4 A4–A6/A9, §2.2 P7–P11, §2.3 J1/J12). Oracle SQL is DuckDB-ANSI
  * over the same parquet tables; both engines derive the star schema
  * from identical expressions (Star.SiopSql / Star.CalendarSql).
  */
object ExtractQueries {
  private val W = s"WITH ${Star.SiopSql},\n${Star.CalendarSql}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "act_demand_blank" -> ((s, d) => Extracts.actDemandBlank(s, d)),
    "fcst_demand_window" -> ((s, d) => Extracts.demandWindow(s, d, 0, 6)),
    "bpc_vad_summarize" -> ((s, d) => Extracts.bpcVad(s, d)),
    "bpc_by_sku_rollup" -> ((s, d) => Extracts.bpcBySku(s, d)),
    "act_unknown_latest_snapshot" -> ((s, d) => Extracts.actUnknown(s, d)),
    "demand_to_final" -> ((s, d) => Transform.actDemandBlankFinal(s, d)))

  private def windowedSql(countryPred: String, lo: Int, hi: Int,
      withSegment: Boolean): String = {
    val seg = if (withSegment) "s.segment, " else ""
    val cyc = if (withSegment) "AND s.cycle = 'Current'" else ""
    s"""$W
       |SELECT * FROM (
       |  SELECT s.planning_system, s.material_id, s.sales_organization,
       |         s.reltio_bu, s.country, $seg c.month_year, c.month_sort,
       |         c.fiscal_year,
       |         ROUND(SUM(s.siop_consensus), 4) AS consensus
       |  FROM siop s JOIN calendar c ON s.month_key = c.month_sort
       |  WHERE $countryPred
       |    $cyc
       |    AND s.reltio_bu IN ${Extracts.BuSetSql}
       |    AND s.month_key >= $lo AND s.month_key < $hi
       |  GROUP BY ALL
       |) WHERE consensus <> 0""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "act_demand_blank" -> windowedSql(
      "(s.country IS NULL OR s.country = '')", 199506, 199606,
      withSegment = true),
    "fcst_demand_window" -> windowedSql(
      "s.country IS NOT NULL AND s.country <> ''", 199606, 199612,
      withSegment = false),
    "bpc_vad_summarize" ->
      s"""$W
         |SELECT * FROM (
         |  SELECT reltio_bu, country, segment,
         |         ROUND(SUM(siop_consensus), 4) AS actual_units,
         |         COUNT(*) AS n_rows
         |  FROM siop
         |  WHERE reltio_bu IS NULL OR reltio_bu NOT IN ('FURNITURE')
         |  GROUP BY ALL
         |) WHERE reltio_bu IS NOT NULL OR country IS NOT NULL
         |        OR segment IS NOT NULL""".stripMargin,
    "bpc_by_sku_rollup" ->
      s"""$W
         |SELECT reltio_bu, country,
         |       ROUND(SUM(siop_consensus), 4) AS units,
         |       GROUPING(reltio_bu, country) AS is_total
         |FROM siop GROUP BY ROLLUP (reltio_bu, country)""".stripMargin,
    "act_unknown_latest_snapshot" ->
      s"""$W, f AS (
         |  SELECT * FROM siop
         |  WHERE reltio_bu IN ${Extracts.BuSetSql} AND siop_consensus <> 0
         |)
         |SELECT reltio_bu, segment, snapshot_date,
         |       ROUND(SUM(siop_consensus), 4) AS units,
         |       COUNT(*) AS n_rows
         |FROM f WHERE snapshot_date = (SELECT MAX(snapshot_date) FROM f)
         |GROUP BY ALL""".stripMargin,
    "demand_to_final" ->
      s"""$W,
         |mapping AS (
         |  SELECT CAST(s_suppkey AS VARCHAR) AS map_sales_org,
         |         n_name AS corrected_country
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |),
         |ext AS (
         |  SELECT * FROM (
         |    SELECT s.planning_system, s.material_id, s.sales_organization,
         |           s.reltio_bu, s.country, s.segment, c.month_year,
         |           c.month_sort, c.fiscal_year,
         |           ROUND(SUM(s.siop_consensus), 4) AS consensus
         |    FROM siop s JOIN calendar c ON s.month_key = c.month_sort
         |    WHERE (s.country IS NULL OR s.country = '')
         |      AND s.cycle = 'Current'
         |      AND s.reltio_bu IN ${Extracts.BuSetSql}
         |      AND s.month_key >= 199506 AND s.month_key < 199606
         |    GROUP BY ALL
         |  ) WHERE consensus <> 0
         |)
         |SELECT COALESCE(e.planning_system, 'SIOP') AS source,
         |       DATE '1996-06-01' AS snapshot,
         |       e.material_id AS material,
         |       e.sales_organization,
         |       CASE WHEN e.country IS NULL OR e.country = ''
         |            THEN m.corrected_country ELSE e.country END AS country,
         |       CAST(strptime(CAST(e.month_sort AS VARCHAR) || '01',
         |            '%Y%m%d') AS DATE) AS attribute,
         |       e.consensus AS value,
         |       'BLNK-C-' || trim(e.reltio_bu) AS bu
         |FROM ext e LEFT JOIN mapping m
         |  ON e.sales_organization = m.map_sales_org""".stripMargin)
}
