package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract expectation audit (X167) — the declarative
  * "great-expectations" gate a production feed runs before anything
  * downstream trusts it: a CONTRACT is a list of rules (not-null,
  * value range, format regex, domain membership, key uniqueness) and
  * the audit reports, per rule, how many rows violate it — in one
  * pass over the table.
  *
  * Scale shape: every predicate rule compiles to a conditional-sum
  * column in a SINGLE aggregate — auditing 20 rules costs one table
  * scan, not 20 (the reference's row-count-per-check
  * `datavalidation.py` loop rescans per check). Uniqueness is the one
  * genuinely non-map-side rule (exact COUNT DISTINCT shuffles the
  * key); swap in [[graft.operators.KmvSketch]] when an estimate
  * suffices. The rule list drives BOTH the Spark plan and the DuckDB
  * oracle from one definition, so they cannot drift (the X153
  * device).
  *
  * Output per rule: `(rule_id, column_name, rule_kind, n_rows,
  * n_violations, viol_ppm, pass_flag)` — a report, not an exception:
  * deciding whether nonzero violations block the load is the
  * caller's policy. */
object Expectations {

  /** One contract rule. `sparkViol` / `sqlViol` are boolean
    * expressions (Spark SQL / DuckDB SQL) marking a VIOLATING row;
    * `kind = "unique"` ignores them and checks key uniqueness. */
  final case class Rule(id: String, column: String, kind: String,
    sparkViol: String, sqlViol: String)

  /** The demo contract over `orders` — one rule of each kind. */
  val OrdersContract: Seq[Rule] = Seq(
    Rule("custkey_not_null", "o_custkey", "not_null",
      "o_custkey IS NULL", "o_custkey IS NULL"),
    Rule("price_range", "o_totalprice", "range",
      "o_totalprice < 0 OR o_totalprice > 300000",
      "o_totalprice < 0 OR o_totalprice > 300000"),
    Rule("priority_format", "o_orderpriority", "regex",
      "o_orderpriority NOT RLIKE '^[1-5]-[A-Z ]+$'",
      "NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')"),
    Rule("status_domain", "o_orderstatus", "domain",
      "o_orderstatus NOT IN ('O', 'F', 'P')",
      "o_orderstatus NOT IN ('O', 'F', 'P')"),
    Rule("orderkey_unique", "o_orderkey", "unique", "", ""))

  /** Run `rules` over `df` in one pass (plus the key-distinct
    * aggregate when a unique rule is present). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val (uniqueRules, predRules) = rules.partition(_.kind == "unique")
    val aggCols =
      predRules.map(r =>
        sum(when(expr(r.sparkViol), 1L).otherwise(0L))
          .cast("long").as("_v_" + r.id)) ++
      uniqueRules.map(r =>
        countDistinct(col(r.column)).cast("long").as("_d_" + r.id)) :+
      count(lit(1)).cast("long").as("_n")
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val ruleStructs = rules.map { r =>
      val viol = r.kind match {
        case "unique" => col("_n") - col("_d_" + r.id)
        case _        => col("_v_" + r.id)
      }
      struct(lit(r.id).as("rule_id"),
        lit(r.column).as("column_name"),
        lit(r.kind).as("rule_kind"),
        col("_n").as("n_rows"),
        viol.cast("long").as("n_violations"))
    }
    one.select(explode(array(ruleStructs: _*)).as("r"))
      .select(col("r.rule_id"), col("r.column_name"),
        col("r.rule_kind"), col("r.n_rows"), col("r.n_violations"))
      .withColumn("viol_ppm",
        // greatest(n,1): on an empty table Spark's non-ANSI div yields
        // NULL while DuckDB errors — 0 violations / 0 rows reads as 0
        expr("(n_violations * 1000000) div greatest(n_rows, 1)"))
      .withColumn("pass_flag",
        when(col("n_violations") === 0L, 1L).otherwise(0L))
  }

  /** The DuckDB replay of [[audit]] for `table`, generated from the
    * SAME rule list. */
  def oracleSql(table: String, rules: Seq[Rule]): String = {
    val (uniqueRules, predRules) = rules.partition(_.kind == "unique")
    val sums = predRules.map(r =>
      s"CAST(SUM(CASE WHEN ${r.sqlViol} THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS v_${r.id}") ++
      uniqueRules.map(r =>
        s"CAST(COUNT(DISTINCT ${r.column}) AS BIGINT) AS d_${r.id}")
    val arms = rules.map { r =>
      val viol = r.kind match {
        case "unique" => s"n - d_${r.id}"
        case _        => s"v_${r.id}"
      }
      s"""SELECT '${r.id}' AS rule_id, '${r.column}' AS column_name,
         |  '${r.kind}' AS rule_kind, n AS n_rows,
         |  CAST($viol AS BIGINT) AS n_violations,
         |  CAST((($viol) * 1000000) // greatest(n, 1) AS BIGINT)
         |    AS viol_ppm,
         |  CAST(CASE WHEN ($viol) = 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS pass_flag
         |FROM s""".stripMargin
    }
    s"""WITH s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM $table)
       |${arms.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
