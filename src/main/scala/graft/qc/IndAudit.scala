package graft.qc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inclusion-dependency audit (X194) — the foreign-key DISCOVERY
  * companion to the FD audit ([[FdAudit]], X190) and the declared-FK
  * check (X64 `qc_referential`): before a curation pipeline trusts
  * `A.x` as a join key into `B.y` (or promotes it to a star-schema
  * FK), it measures how much of `A.x`'s value domain is actually
  * contained in `B.y` — the IND `A.x ⊆ B.y` of the profiling
  * literature (SPIDER/BINDER check candidate INDs exactly this way:
  * at distinct-VALUE grain, never row grain). NULL references hold
  * vacuously, matching SQL FK semantics.
  *
  * Report per declared candidate: distinct non-null value count on
  * the dependent side, how many of those are missing from the
  * referenced side, exact integer containment ppm, and a 0/1 `holds`
  * verdict.
  *
  * Scale shape: each referenced TABLE is scanned once no matter how
  * many candidates cite it — a bounded ×(candidates-on-this-table)
  * unpivot, then distinct at `(ind, value)` grain (map-side
  * combinable, the row count collapses to the value domain before
  * anything crosses the wire). The verdict is one `(ind, value)`
  * equi-join between the two distinct sides plus an |inds|-grain
  * aggregate — at 100 TB the join carries value DOMAINS (key
  * cardinality), not table rows. The candidate list generates BOTH
  * the Spark plan and the DuckDB oracle (the X167 device), so they
  * cannot drift.
  */
object IndAudit {

  /** One candidate inclusion dependency: `fromTable.fromCol ⊆
    * toTable.toCol` (values compared as strings, so mixed integer
    * widths unify). */
  final case class Ind(id: String, fromTable: String, fromCol: String,
      toTable: String, toCol: String)

  /** The demo contract: four genuine fixture FKs that hold, one
    * fully-disjoint domain (nation names vs region names), and one
    * partial containment (`p_size` 1–50 vs nationkey 0–24). */
  val StarContract: Seq[Ind] = Seq(
    Ind("li_part_fk", "lineitem", "l_partkey", "part", "p_partkey"),
    Ind("li_supp_fk", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    Ind("ord_cust_fk", "orders", "o_custkey", "customer", "c_custkey"),
    Ind("cust_nat_fk", "customer", "c_nationkey", "nation",
      "n_nationkey"),
    Ind("nat_name_in_region", "nation", "n_name", "region", "r_name"),
    Ind("size_as_nation", "part", "p_size", "nation", "n_nationkey"))

  /** Distinct `(ind_id, v)` pairs for one side of the contract: one
    * scan per referenced table, arms unpivoted, nulls dropped. */
  private def side(load: String => DataFrame,
      refs: Seq[(String, String, String)]): DataFrame =
    refs.groupBy(_._2).map { case (table, rs) =>
      val arms = rs.map { case (id, _, c) =>
        struct(lit(id).as("ind_id"), col(c).cast("string").as("v")) }
      load(table)
        .select(explode(array(arms: _*)).as("a"))
        .select(col("a.ind_id"), col("a.v"))
        .filter(col("v").isNotNull)
    }.reduce(_ unionByName _).distinct()

  /** Audit `inds` over the tables in `dir`. */
  def audit(spark: SparkSession, dir: String,
      inds: Seq[Ind] = StarContract): DataFrame =
    auditTables(spark, graft.core.Tables(spark, dir, _), inds)

  /** Audit against an arbitrary table loader (test seam). */
  def auditTables(spark: SparkSession, load: String => DataFrame,
      inds: Seq[Ind]): DataFrame = {
    val from = side(load, inds.map(i => (i.id, i.fromTable, i.fromCol)))
    val to = side(load, inds.map(i => (i.id, i.toTable, i.toCol)))
    val meta = broadcast(spark.createDataFrame(inds.map(i =>
        (i.id, s"${i.fromTable}.${i.fromCol}",
          s"${i.toTable}.${i.toCol}")))
      .toDF("ind_id", "from_ref", "to_ref"))
    from.join(to.withColumn("hit", lit(1L)), Seq("ind_id", "v"), "left")
      .groupBy(col("ind_id"))
      .agg(count(lit(1)).cast("long").as("n_values"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_missing"))
      .join(meta, Seq("ind_id"))
      .select(col("ind_id"), col("from_ref"), col("to_ref"),
        col("n_values"), col("n_missing"),
        expr("((n_values - n_missing) * 1000000) " +
          "div greatest(n_values, 1)").cast("long")
          .as("containment_ppm"),
        when(col("n_missing") === 0L, 1L).otherwise(0L).cast("long")
          .as("holds"))
  }

  /** The DuckDB replay of [[audit]], generated from the SAME list. */
  def oracleSql(inds: Seq[Ind] = StarContract): String = {
    def sideSql(refs: Seq[(String, String, String)]): String =
      refs.map { case (id, t, c) =>
        s"""SELECT DISTINCT '$id' AS ind_id, CAST($c AS VARCHAR) AS v
           |FROM $t WHERE $c IS NOT NULL""".stripMargin }
        .mkString("\nUNION ALL\n")
    val metaRows = inds.map(i =>
      s"('${i.id}', '${i.fromTable}.${i.fromCol}', " +
        s"'${i.toTable}.${i.toCol}')").mkString(",\n    ")
    s"""WITH f AS (
       |${sideSql(inds.map(i => (i.id, i.fromTable, i.fromCol)))}),
       |t AS (
       |${sideSql(inds.map(i => (i.id, i.toTable, i.toCol)))}),
       |m(ind_id, from_ref, to_ref) AS (VALUES
       |    $metaRows),
       |a AS (
       |  SELECT f.ind_id, CAST(COUNT(*) AS BIGINT) AS n_values,
       |    CAST(SUM(CASE WHEN t.v IS NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_missing
       |  FROM f LEFT JOIN t ON f.ind_id = t.ind_id AND f.v = t.v
       |  GROUP BY 1)
       |SELECT m.ind_id, m.from_ref, m.to_ref, a.n_values, a.n_missing,
       |  CAST(((a.n_values - a.n_missing) * 1000000)
       |    // greatest(a.n_values, 1) AS BIGINT) AS containment_ppm,
       |  CAST(CASE WHEN a.n_missing = 0 THEN 1 ELSE 0 END AS BIGINT)
       |    AS holds
       |FROM a JOIN m ON a.ind_id = m.ind_id""".stripMargin
  }
}
