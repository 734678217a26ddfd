package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SIOP-style star schema derived deterministically from the TPC-H-ish
  * driver tables, per FIXTURES.md §2. This is the input shape of the
  * reference's 15 DAX extracts (reference:
  * `PowerShell script/ActDemandBlank.ps1:26-52`, `BPC_VAD.ps1:64-80`).
  *
  * Determinism: the reference's extracts key off `TODAY()`; every query
  * here takes a fixed as-of date instead (SURVEY.md §7.4).
  *
  * Scale notes: the fact derivation is a chain of equi-joins where only
  * `orders` is large relative to `lineitem`; `customer` and `nation` are
  * dimension-sized and broadcast. At 100 TB the lineitem⋈orders join
  * shuffles on the order key — both sides would be bucketed/partitioned
  * by that key in a real deployment; the declarative join lets AQE pick
  * broadcast vs sort-merge per actual size.
  */
object Star {
  /** Fixed as-of date for all month-window extract queries. */
  val AsOf = "1996-06-01"

  /** The SIOP fact table: one row per lineitem with planning dims. */
  def siop(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o  = Tables(spark, dir, "orders")
    val c  = Tables(spark, dir, "customer")
    val n  = Tables(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        concat(lit("PS-"), (col("l_suppkey") % 3).cast("string"))
          .as("planning_system"),
        col("l_partkey").cast("string").as("material_id"),
        col("l_suppkey").cast("string").as("sales_organization"),
        col("c_mktsegment").as("reltio_bu"),
        // blank-country rows synthesized deterministically (FIXTURES §2)
        when(col("c_custkey") % 7 === 0, lit(null: String))
          .otherwise(col("n_name")).as("country"),
        col("o_orderpriority").as("segment"),
        when(col("o_orderstatus") === "O", lit("Current"))
          .otherwise(lit("Prior")).as("cycle"),
        date_trunc("month", col("o_orderdate")).cast("date")
          .as("snapshot_date"),
        col("l_quantity").as("siop_consensus"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("month_key"),
        // raw scan column passthrough: month-window queries add a
        // redundant range predicate on this so the parquet reader can
        // prune row groups by l_shipdate min/max stats — a predicate on
        // the DERIVED month_key is not sargable and only filters
        // post-scan
        col("l_shipdate").as("ship_ts"))
  }

  /** Calendar dim (reference `ActDemandBlank.ps1:36-52` 'Calendar'):
    * month_sort yyyymm int, month_year "MMM yyyy", month_start date,
    * fiscal_year (FY starts October, `myConversionsClass.py:703-709`). */
  def calendar(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(date_trunc("month", col("l_shipdate")).cast("date")
        .as("month_start"))
      .distinct()
      .select(
        // derived ints are long so Spark parquet output matches the
        // DuckDB oracle's BIGINT arithmetic type-for-type
        (year(col("month_start")) * 100 + month(col("month_start")))
          .cast("long").as("month_sort"),
        date_format(col("month_start"), "MMM yyyy").as("month_year"),
        col("month_start"),
        when(month(col("month_start")) > 9, year(col("month_start")) + 1)
          .otherwise(year(col("month_start"))).cast("long")
          .as("fiscal_year"))

  /** DuckDB-equivalent CTEs for the same derivations, prefixed onto
    * oracle SQL so both engines compute from identical base tables. */
  val SiopSql: String =
    """siop AS (
      |  SELECT 'PS-' || CAST(l_suppkey % 3 AS VARCHAR) AS planning_system,
      |         CAST(l_partkey AS VARCHAR) AS material_id,
      |         CAST(l_suppkey AS VARCHAR) AS sales_organization,
      |         c_mktsegment AS reltio_bu,
      |         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE n_name END AS country,
      |         o_orderpriority AS segment,
      |         CASE WHEN o_orderstatus = 'O' THEN 'Current' ELSE 'Prior' END AS cycle,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS snapshot_date,
      |         l_quantity AS siop_consensus,
      |         year(l_shipdate)*100 + month(l_shipdate) AS month_key
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |)""".stripMargin

  val CalendarSql: String =
    """calendar AS (
      |  SELECT year(month_start)*100 + month(month_start) AS month_sort,
      |         strftime(month_start, '%b %Y') AS month_year,
      |         month_start,
      |         CASE WHEN month(month_start) > 9 THEN year(month_start) + 1
      |              ELSE year(month_start) END AS fiscal_year
      |  FROM (SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE)
      |                 AS month_start FROM lineitem)
      |)""".stripMargin
}
