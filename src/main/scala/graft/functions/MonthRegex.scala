package graft.functions

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale
import org.apache.spark.sql.Column

/** P6: the reference's last-12-months regex filter
  * (`pipeline/datavalidation.py:173-234`): build an OR-alternation of
  * month-token spellings for the N months before a snapshot and keep
  * rows whose `Attribute` text matches.
  *
  * The generation is driver-side (a few hundred bytes of pattern); the
  * match is one `rlike` per row. SURVEY §2.2 notes the semantically
  * equivalent parsed-date range predicate is the preferred form at
  * scale (sargable, pushable) — this exists for behavioral parity with
  * the reference's text-matching path.
  */
object MonthRegex {

  private val Spellings: Seq[DateTimeFormatter] = Seq(
    "yyyyMM", "yyyy-MM", "MM/yyyy", "M/yyyy", "MMM yyyy", "MMM-yy")
    .map(p => DateTimeFormatter.ofPattern(p, Locale.US))

  /** All token spellings for the `months` months ending at (excluding)
    * the snapshot month. */
  def monthTokens(snapshot: LocalDate, months: Int = 12): Seq[String] = {
    val first = snapshot.withDayOfMonth(1)
    (1 to months).flatMap { back =>
      val m = first.minusMonths(back)
      Spellings.map(_.format(m))
    }.distinct
  }

  /** The OR-alternation pattern. Tokens are emitted raw: every
    * spelling is digits, letters, space, '-' or '/' — no regex
    * metacharacters — and raw tokens keep the pattern portable to
    * RE2-based engines (the DuckDB oracle), where Java's \Q...\E
    * quoting is not recognized. */
  def pattern(snapshot: LocalDate, months: Int = 12): String =
    monthTokens(snapshot, months).mkString("(", "|", ")")

  /** Predicate: attribute text mentions any of the last N months. */
  def lastMonthsFilter(attribute: Column, snapshot: LocalDate,
      months: Int = 12): Column =
    attribute.rlike(pattern(snapshot, months))
}
