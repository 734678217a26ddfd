package graft

import org.apache.spark.sql.functions._
import graft.transform.{JobConfig, Runner}

/** Config-driven transform dispatch (reference `pipeline/lib.py:166-298`,
  * `runner.py:22-178`): each JobConfig mode maps to a column choice. */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    ("PS-1", "M1", "10", "BDB", "DE", 199706L, 5.0, "2026-02-01"),
    ("PS-2", "M2", "11", null, "", 199707L, 7.0, "2026-03-01"))
    .toDF("planning_system", "material_id", "sales_organization",
      "reltio_bu", "country", "month_sort", "consensus", "snapshot_date")

  private val mapping = Seq(("10", "France"), ("11", "Italy"))
    .toDF("map_sales_org", "corrected_country")

  test("mapping mode backfills blank country and rewrites BU (F9)") {
    val cfg = JobConfig(label = "ACT",
      extract = (_, _) => feed, useMapping = true)
    val out = Runner.transformToFinal(feed, cfg, Some(mapping),
      asOf = "1997-06-15")
      .orderBy("material")
      .select("source", "snapshot", "material", "country", "bu")
      .as[(String, java.sql.Date, String, String, String)].collect()
    // non-blank country kept; blank country backfilled from mapping
    assert(out(0) == (("PS-1", java.sql.Date.valueOf("1997-06-01"),
      "M1", "DE", "BLNK-C-BDB")))
    // null BU -> "BLNK-C-" (lib.py:289: blank stays, prefix applied)
    assert(out(1) == (("PS-2", java.sql.Date.valueOf("1997-06-01"),
      "M2", "Italy", "BLNK-C-")))
  }

  test("const/col precedence, blank sales org, performance cleaning") {
    val dirty = feed.withColumn("country",
      concat(coalesce(col("country"), lit("X")), lit(" Performance")))
    val cfg = JobConfig(label = "BPC",
      extract = (_, _) => dirty,
      salesOrgMode = "blank",
      sourceConst = Some("BPC"),
      materialCandidates = Seq("material_id_harmonized", "material_id"),
      buConst = Some("MDS"),
      countryCleanPerformance = true)
    val out = Runner.transformToFinal(dirty, cfg, None)
      .orderBy("material")
      .select("source", "sales_organization", "country", "bu")
      .as[(String, String, String, String)].collect()
    assert(out(0) == (("BPC", "", "DE", "MDS")))
    assert(out(1) == (("BPC", "", "", "MDS")))
  }

  test("from_file snapshot mode reads the configured column") {
    val cfg = JobConfig(label = "FU",
      extract = (_, _) => feed,
      snapshotMode = "from_file", snapshotCol = Some("snapshot_date"),
      sourceCol = Some("planning_system"))
    val out = Runner.transformToFinal(feed, cfg, None)
      .orderBy("material").select("source", "snapshot")
      .as[(String, java.sql.Date)].collect()
    assert(out(0) == (("PS-1", java.sql.Date.valueOf("2026-02-01"))))
    assert(out(1) == (("PS-2", java.sql.Date.valueOf("2026-03-01"))))
  }

  test("material candidate fallback picks the first existing column") {
    val withHarmonized = feed
      .withColumn("material_id_harmonized", concat(lit("H-"),
        col("material_id")))
    val cfg = JobConfig(label = "X", extract = (_, _) => withHarmonized)
    val out = Runner.transformToFinal(withHarmonized, cfg, None)
      .orderBy("material").select("material").as[String].collect()
    assert(out.toSeq == Seq("H-M1", "H-M2"))
    // attribute derives from month_sort (F14)
    val attr = Runner.transformToFinal(withHarmonized, cfg, None)
      .orderBy("material").select("attribute")
      .as[java.sql.Date].collect()
    assert(attr(0) == java.sql.Date.valueOf("1997-06-01"))
  }

  test("mapping mode without a mapping frame fails fast") {
    val cfg = JobConfig(label = "A", extract = (_, _) => feed,
      useMapping = true)
    intercept[IllegalArgumentException] {
      Runner.transformToFinal(feed, cfg, None)
    }
  }
}
