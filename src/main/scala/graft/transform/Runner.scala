package graft.transform

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Star
import graft.functions.GraftFunctions._

/** Config-as-data job spec — the reference's 13-instance `JobConfig`
  * dataclass (`pipeline/lib.py:166-185`) with the file/PowerShell
  * plumbing replaced by an extract query: in this engine a "job input"
  * is a DataFrame-producing function, not a CSV glob. Field semantics
  * follow `transform_to_final` (`lib.py:210-298`) exactly; column names
  * are the engine's snake_case star-schema names.
  */
case class JobConfig(
    label: String,
    extract: (SparkSession, String) => DataFrame,
    useMapping: Boolean = false,
    snapshotMode: String = "current_month", // | "from_file"
    snapshotCol: Option[String] = None,
    salesOrgMode: String = "from_file", // | "blank"
    sourceConst: Option[String] = None,
    sourceCol: Option[String] = None,
    materialCandidates: Seq[String] =
      Seq("material_id_harmonized", "material_id"),
    valueCol: String = "consensus",
    countryFrom: String = "country",
    buConst: Option[String] = None,
    buCol: Option[String] = None,
    countryCleanPerformance: Boolean = false)

/** The 12-config dispatch of `pipeline/runner.py:22-178` +
  * `lib.py:210-298` as one declarative transform: every mode is a
  * column-expression choice, so the whole job stays a single lazy plan
  * (extract → optional broadcast mapping join → projection) that
  * Catalyst optimizes end-to-end — no per-mode code paths touching
  * data. */
object Runner {

  /** `transform_to_final` (`lib.py:210-298`): raw feed → canonical
    * 8-column schema, driven entirely by [[JobConfig]]. */
  def transformToFinal(extract: DataFrame, cfg: JobConfig,
      mapping: Option[DataFrame], asOf: String = Star.AsOf): DataFrame = {
    require(!cfg.useMapping || mapping.nonEmpty,
      "mapping frame required when useMapping=true") // lib.py:223-224
    val cols = extract.columns.toSet

    // J1 mapping enrichment (`enrich_with_mapping`, lib.py:187-207):
    // blank Country backfilled from the mapping's corrected country
    val enriched = if (cfg.useMapping) {
      val m = broadcast(mapping.get)
      extract.join(m,
          extract("sales_organization") === m("map_sales_org"), "left")
    } else extract

    val countrySrc =
      if (cfg.useMapping)
        when(col(cfg.countryFrom).isNull || col(cfg.countryFrom) === "",
          col("corrected_country")).otherwise(col(cfg.countryFrom))
      else col(cfg.countryFrom)
    // F2 (`clean_country_performance`, lib.py:157-159): literal
    // replace-all of " Performance"
    val country =
      if (cfg.countryCleanPerformance) dropLiteral(countrySrc, " Performance")
      else countrySrc

    val snapshot = cfg.snapshotMode match {
      case "current_month" => // F13, lib.py:104-105
        trunc(to_date(lit(asOf)), "month")
      case "from_file" =>
        col(cfg.snapshotCol.getOrElse("snapshot")).cast("date")
      case other => throw new IllegalArgumentException(
        s"unknown snapshot_mode '$other'")
    }

    // source precedence: const > col > planning_system > label
    // (lib.py:245-253)
    val source = cfg.sourceConst.map(lit).getOrElse(
      cfg.sourceCol.filter(cols.contains).map(col).getOrElse(
        if (cols.contains("planning_system"))
          coalesce(col("planning_system"), lit(cfg.label))
        else lit(cfg.label)))

    // P3 candidate-column resolution (pick_col, lib.py:149-155)
    val material = cfg.materialCandidates.find(cols.contains).map(col)
      .getOrElse(throw new IllegalArgumentException(
        s"none of ${cfg.materialCandidates} present"))

    val salesOrg = cfg.salesOrgMode match {
      case "blank" => lit("")
      case _ => if (cols.contains("sales_organization"))
        col("sales_organization") else lit("")
    }

    // F14: attribute = first-of-month of the measured month; the
    // extract's month_sort is the already-parsed yyyymm key
    val attribute =
      if (cols.contains("month_sort"))
        to_date(concat(col("month_sort").cast("string"), lit("01")),
          "yyyyMMdd")
      else lit(null).cast("date")

    // BU precedence: const > col > reltio_bu > "" (lib.py:273-281);
    // mapping-enriched feeds get the F9 BLNK-C- rewrite (lib.py:285-292)
    val buBase = cfg.buConst.map(lit).getOrElse(
      cfg.buCol.filter(cols.contains).map(col).getOrElse(
        if (cols.contains("reltio_bu")) col("reltio_bu") else lit("")))
    val bu =
      if (cfg.useMapping)
        concat(lit("BLNK-C-"), trim(coalesce(buBase, lit(""))))
      else buBase

    enriched.select( // P1 final projection (lib.py:294-297)
      source.as("source"),
      snapshot.as("snapshot"),
      material.as("material"),
      salesOrg.as("sales_organization"),
      country.as("country"),
      attribute.as("attribute"),
      col(cfg.valueCol).as("value"),
      bu.as("bu"))
  }

  /** Run one job end-to-end: extract → transform (the engine's stage
    * 3-6 of SURVEY §3.1). */
  def runJob(spark: SparkSession, dir: String, cfg: JobConfig,
      asOf: String = Star.AsOf): DataFrame = {
    val mapping =
      if (cfg.useMapping) Some(Transform.salesOrgMapping(spark, dir))
      else None
    transformToFinal(cfg.extract(spark, dir), cfg, mapping, asOf)
  }

  /** The reference's job list (`runner.py:22-178`), one config per
    * distinct transform variant actually exercised by the engine's
    * extract family. */
  def jobs: Map[String, JobConfig] = Map(
    // runner.py:25-38 — ACT blank: mapping join, corrected country,
    // BLNK-C BU rewrite, current-month snapshot
    "act_blank" -> JobConfig(
      label = "ACT",
      extract = (s, d) => graft.extract.Extracts.actDemandBlank(s, d),
      useMapping = true),
    // runner.py:107-124 — BPC VAD: constant source/BU, blank sales
    // org, " Performance" country cleaning (F2)
    "bpc_vad" -> JobConfig(
      label = "BPC_VAD",
      extract = (s, d) => bpcVadDetail(s, d),
      salesOrgMode = "blank",
      sourceConst = Some("BPC"),
      materialCandidates = Seq("material_id"),
      valueCol = "actual_units",
      buConst = Some("MDS"),
      countryCleanPerformance = true),
    // runner.py:166-178 — FCST Unknown: snapshot from file, source
    // from the planning-system column, consensus as the value
    "fcst_unknown" -> JobConfig(
      label = "FCST_Unknown",
      extract = (s, d) => graft.extract.Extracts.fcstUnknown(s, d),
      snapshotMode = "from_file",
      snapshotCol = Some("snapshot_date"),
      sourceCol = Some("planning_system"),
      valueCol = "consensus"))

  /** BPC_VAD job input: the bpcVad shape at material grain (the
    * reference's Bpcvad.csv carries `BPC All[Material ID]`,
    * `runner.py:116`) with a deterministically "dirty" country — the
    * `<name> Performance` suffix `clean_country_performance` exists to
    * strip (`lib.py:157-159`) — so the F2 cleaning path transforms
    * real rows, not a vacuous no-op. */
  def bpcVadDetail(spark: SparkSession, dir: String): DataFrame = {
    val dirty = when(col("country").isNotNull &&
        length(col("country")) % 2 === 0,
      concat(col("country"), lit(" Performance")))
      .otherwise(col("country"))
    Star.siop(spark, dir)
      .filter(col("reltio_bu").isNull ||
        !col("reltio_bu").isin("FURNITURE"))
      .groupBy(col("material_id"), col("reltio_bu"), dirty.as("country"),
        col("segment"))
      .agg(round(sum(col("siop_consensus")), 4).as("actual_units"))
      .filter(Seq(col("material_id"), col("reltio_bu"), col("country"),
        col("segment")).map(_.isNotNull).reduce(_ || _))
  }
}
