package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-expression column library covering SURVEY.md §2.8 (F1–F30).
  *
  * Every function is a `Column => Column` built from
  * `org.apache.spark.sql.functions` so it stays inside whole-stage
  * codegen — no UDFs anywhere (SURVEY §2.10: nothing in the reference
  * needs one).
  */
object GraftFunctions {

  // ---- cleaning (reference pipeline/lib.py, packages/myDFClass.py) ----

  /** F1: trim, with pandas null-artifact normalization — `""`, `"nan"`,
    * `"None"` all collapse to NULL (reference `SqlUpload_Actuals.py:75-77`). */
  def cleanString(c: Column): Column = {
    val t = trim(c)
    when(t === "" || t === "nan" || t === "None" || t === "NaN", lit(null: String))
      .otherwise(t)
  }

  /** F2: drop a literal suffix, all occurrences (reference `lib.py:157-159`
    * uses non-regex replace-all of " Performance"). */
  def dropLiteral(c: Column, literal: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(literal), "")

  /** F3: keep-digits scrub `[^0-9.\-] -> ""` (reference `lib.py:161-164`). */
  def scrubNumeric(c: Column): Column = regexp_replace(c, "[^0-9.\\-]", "")

  /** F4: thousands-comma removal + double cast; unparsable -> NULL
    * (reference `SqlUpload_Actuals.py:82-89`, the upload/NULL path).
    * TRY-cast so ANSI mode (Spark 4 default) nulls instead of throwing. */
  def parseNumberNull(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.tryCast(
      regexp_replace(c, ",", ""),
      org.apache.spark.sql.types.DoubleType)

  /** F4 variant: unparsable -> 0.0 (the QC path, `datavalidation.py:308`). */
  def parseNumberZero(c: Column): Column =
    coalesce(parseNumberNull(c), lit(0.0))

  /** F6: zero-pad keys (reference `myConversionsClass.py:135-142`). */
  def zeroPad(c: Column, width: Int): Column = lpad(c, width, "0")

  /** F7: strip leading zeros and prefix "SKU-" for numeric-looking keys
    * (reference `myDFClass.py:140`). */
  def skuKey(c: Column): Column =
    concat(lit("SKU-"), regexp_replace(c, "^0+", ""))

  /** F8: composite upper-cased `BU|MaterialID` key (reference
    * `myDFClass.py:156-158`). */
  def buMatKey(bu: Column, mat: Column): Column =
    upper(concat_ws("|", bu, mat))

  /** F9: `BLNK-C-<bu>` rewrite on mapping-enriched feeds (reference
    * `lib.py:285-292`). */
  def blankBuRewrite(bu: Column): Column =
    concat(lit("BLNK-C-"), trim(bu))

  /** F10: BU recode map (reference `myDFClass.py:161-168`). */
  def recodeBu(c: Column): Column =
    when(c === "SRG", "SUR")
      .when(c.isin("DOP", "DOP-C", "DOP-S"), "DISC")
      .otherwise(c)

  /** F12: numeric-parsability predicate (reference `myDFClass.py:11-18`);
    * TRY_CAST semantics, matching the oracle's TRY_CAST. */
  def isNumeric(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.tryCast(c,
      org.apache.spark.sql.types.DoubleType).isNotNull

  // ---- dates / fiscal calendar ----

  /** F13: first-of-month snapshot for an as-of date, `MM/dd/yyyy` text
    * (reference `lib.py:104-105`). */
  def snapshotLabel(asOf: Column): Column =
    date_format(trunc(asOf, "month"), "MM/dd/yyyy")

  /** F14: month-label parse — `MMM yyyy` | `MMM-yyyy` | 6-digit `yyyyMM`
    * -> first-of-month date (reference `lib.py:107-125`; the reference's
    * 2-digit-year form is intentionally normalized to 4-digit at ingest
    * to avoid century-pivot ambiguity). */
  def parseMonthLabel(c: Column): Column = coalesce(
    to_date(c, "MMM yyyy"),
    to_date(c, "MMM-yyyy"),
    to_date(concat(c, lit("01")), "yyyyMMdd"))

  /** F15: `M/yyyy` | `M-yyyy` -> first-of-month (reference `lib.py:127-146`). */
  def parseSlashMonth(c: Column): Column =
    to_date(regexp_replace(c, "-", "/"), "M/yyyy")

  /** F16: lenient date parse, `MM/dd/yyyy` preferred then ISO;
    * unparsable -> NULL (the reference's `errors="coerce"` NaT
    * semantics, `Staging.py:114-118` — try_to_timestamp, because ANSI
    * `to_date` throws on malformed input). */
  def parseDateLenient(c: Column): Column =
    coalesce(try_to_timestamp(c, lit("MM/dd/yyyy")), try_to_timestamp(c))
      .cast("date")

  /** F17: truncate to Monday week start (reference
    * `myConversionsClass.py:614-625`). */
  def weekStart(c: Column): Column = date_trunc("week", c).cast("date")

  /** F18: calendar date -> fiscal year (FY starts October; reference
    * `myConversionsClass.py:685-709`). */
  def fiscalYear(d: Column): Column =
    when(month(d) > 9, year(d) + 1).otherwise(year(d))

  /** F19: FY label extraction from free text — `FY26`/`FY2026`/any 20xx
    * year; yields the 4-digit year or NULL (reference
    * `datavalidation.py:114-170`). */
  def fyYearFromText(c: Column): Column = coalesce(
    when(regexp_extract(c, "FY(20\\d{2})", 1) =!= "",
      regexp_extract(c, "FY(20\\d{2})", 1)).cast("long"),
    when(regexp_extract(c, "FY(\\d{2})", 1) =!= "",
      regexp_extract(c, "FY(\\d{2})", 1).cast("long") + 2000),
    when(regexp_extract(c, "(20\\d{2})", 1) =!= "",
      regexp_extract(c, "(20\\d{2})", 1)).cast("long"))

  /** F20: month-key arithmetic `year*100+month` after an EDATE-style
    * month shift (reference `ActDemandBlank.ps1:22-23`). */
  def monthKey(d: Column, shiftMonths: Int = 0): Column = {
    val s = add_months(d, shiftMonths)
    (year(s) * 100 + month(s)).cast("long")
  }

  // ---- variance / QC math ----

  /** F21a: datavalidation variance — `(new-old)/old`, NULL when old=0
    * (reference `datavalidation.py:364-376`). */
  def varianceNull(newV: Column, oldV: Column): Column =
    when(oldV === 0, lit(null)).otherwise((newV - oldV) / oldV)

  /** F21b: qualitycheck PASS/FAIL at a threshold, zero-baseline rule:
    * old=0 -> PASS iff new=0 else FAIL (reference
    * `qualitycheck.py:176-180`, threshold `:23`). */
  def qcStatus(newV: Column, oldV: Column, threshold: Double = 0.15): Column =
    when(oldV === 0, when(newV === 0, "PASS").otherwise("FAIL"))
      .otherwise(when(abs((newV - oldV) / oldV) <= threshold, "PASS")
        .otherwise("FAIL"))

  /** F23: K/M/B humanization. Built on decimal casts (not printf) so the
    * string form is engine-portable (reference `datavalidation.py:79-111`). */
  def humanize(v: Column): Column = {
    def part(x: Column) = round(x, 1).cast("decimal(28,1)").cast("string")
    when(v.isNull, "-")
      .when(abs(v) >= 1e9, concat(part(v / 1e9), lit("B")))
      .when(abs(v) >= 1e6, concat(part(v / 1e6), lit("M")))
      .when(abs(v) >= 1e3, concat(part(v / 1e3), lit("K")))
      .otherwise(part(v))
  }

  /** F24: forecast accuracy — AbsErr% = |err|/demand, FCA = 1-AbsErr%;
    * demand=0 => (0, 0.99) (reference `myConversionsClass.py:254-264`). */
  def absErrPct(err: Column, demand: Column): Column =
    when(demand === 0, lit(0.0)).otherwise(abs(err) / demand)
  def fca(err: Column, demand: Column): Column =
    when(demand === 0, lit(0.99)).otherwise(lit(1.0) - abs(err) / demand)

  /** F25: incoming orders `(order-cancelled)*factor` (reference
    * `myConversionsClass.py:674-678`). */
  def incomingOrders(qty: Column, cancelled: Column, factor: Column): Column =
    (qty - cancelled) * factor

  /** F26: age bucketing (reference `myConversionsClass.py:599-604`). */
  def ageBucket(age: Column, threshold: Int): Column =
    when(age >= threshold, "aged").otherwise("current")
}
