package graft.qc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-functional-dependency audit (X190) — the metadata
  * discovery step a curation pipeline runs before trusting a column as
  * a join key, a partition key, or a dedup canon: does X → Y actually
  * hold in the data, and when it doesn't, how badly is it broken?
  * (Classic profiling literature: TANE/FDEP discover FDs; production
  * pipelines CHECK a declared list — this is the check.)
  *
  * A declared dependency X → Y is audited as: group by X, count
  * distinct Y per group; a group with more than one dependent value
  * violates. The report per FD: total key-group count, violating
  * group count, violation ppm, and the worst group's dependent count
  * (`max_dependents` — 1 means the FD holds exactly).
  *
  * Scale shape: ALL declared FDs audit in one table scan — each FD
  * contributes one (fd, lhs, rhs) arm to a bounded ×|FDs| unpivot,
  * then ONE two-level aggregation chain does the distinct-count and
  * the group verdict (`groupBy(fd,lhs,rhs) → groupBy(fd,lhs) →
  * groupBy(fd)`, every level map-side combinable) — never one
  * shuffle-per-FD over the raw table, and never `countDistinct` inside
  * a low-cardinality group (the two-level form IS its shuffle-safe
  * expansion). The FD list generates BOTH the Spark plan and the
  * DuckDB oracle from one definition (the X167 device), so they
  * cannot drift.
  */
object FdAudit {

  /** One declared dependency: `lhs → rhs`, both plain column names
    * (values are compared as strings, so mixed types unify). */
  final case class Fd(id: String, lhs: String, rhs: String)

  /** The demo contract over `part`: one exact key FD (partkey → name,
    * holds with max_dependents = 1) and three approximate ones the
    * fixture genuinely violates. */
  val PartContract: Seq[Fd] = Seq(
    Fd("key_to_name", "p_partkey", "p_name"),
    Fd("name_to_brand", "p_name", "p_brand"),
    Fd("type_to_size", "p_type", "p_size"),
    Fd("name_to_type", "p_name", "p_type"))

  /** Audit `fds` over `df` in one scan. */
  def audit(df: DataFrame, fds: Seq[Fd]): DataFrame = {
    val arms = fds.map(fd => struct(lit(fd.id).as("fd_id"),
      col(fd.lhs).cast("string").as("lhs"),
      col(fd.rhs).cast("string").as("rhs")))
    df.select(explode(array(arms: _*)).as("a"))
      .select(col("a.fd_id"), col("a.lhs"), col("a.rhs"))
      .groupBy(col("fd_id"), col("lhs"), col("rhs")).agg(count(lit(1)))
      .groupBy(col("fd_id"), col("lhs"))
      // count the distinct NON-NULL dependents (countDistinct
      // semantics in both engines); a distinct (lhs, rhs) pair is one
      // row here, so the conditional sum IS the distinct count
      .agg(sum(when(col("rhs").isNotNull, 1L).otherwise(0L))
        .cast("long").as("nd"))
      .groupBy(col("fd_id"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum(when(col("nd") > 1L, 1L).otherwise(0L)).cast("long")
          .as("n_violating"),
        max(col("nd")).cast("long").as("max_dependents"))
      .join(broadcast(df.sparkSession.createDataFrame(
        fds.map(fd => (fd.id, fd.lhs, fd.rhs)))
        .toDF("fd_id", "lhs_col", "rhs_col")), Seq("fd_id"))
      .select(col("fd_id"), col("lhs_col"), col("rhs_col"),
        col("n_keys"), col("n_violating"),
        expr("(n_violating * 1000000) div greatest(n_keys, 1)")
          .cast("long").as("viol_key_ppm"),
        col("max_dependents"))
  }

  /** The DuckDB replay of [[audit]] for `table`, generated from the
    * SAME FD list. */
  def oracleSql(table: String, fds: Seq[Fd]): String = {
    val arms = fds.map(fd =>
      s"""SELECT '${fd.id}' AS fd_id, '${fd.lhs}' AS lhs_col,
         |  '${fd.rhs}' AS rhs_col,
         |  CAST(${fd.lhs} AS VARCHAR) AS lhs,
         |  CAST(${fd.rhs} AS VARCHAR) AS rhs FROM $table""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH u AS (
       |$arms),
       |g AS (
       |  SELECT fd_id, lhs_col, rhs_col, lhs,
       |    CAST(COUNT(DISTINCT rhs) AS BIGINT) AS nd
       |  FROM u GROUP BY 1, 2, 3, 4)
       |SELECT fd_id, lhs_col, rhs_col,
       |  CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violating,
       |  CAST((CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000) // greatest(COUNT(*), 1) AS BIGINT)
       |    AS viol_key_ppm,
       |  CAST(MAX(nd) AS BIGINT) AS max_dependents
       |FROM g GROUP BY 1, 2, 3""".stripMargin
  }
}
