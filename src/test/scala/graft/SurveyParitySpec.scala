package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage contract is only as good as the inventory: round 8
  * shipped two oracle-green queries (`qc_gini`, `qc_value_drift`) that
  * the SURVEY §2.11 table never listed, so the audit silently skipped
  * them. This spec makes the drift impossible — SURVEY §2.12 carries a
  * machine-parseable ledger of every query name, and the build fails
  * unless ledger and live registry agree in BOTH directions. */
class SurveyParitySpec extends AnyFunSuite {

  private val SurveyPath = java.nio.file.Paths.get("SURVEY.md")

  private def ledgerNames: Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(SurveyPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val begin = text.indexOf("<!-- QUERY_LEDGER_BEGIN -->")
    val end = text.indexOf("<!-- QUERY_LEDGER_END -->")
    assert(begin >= 0 && end > begin,
      "SURVEY.md must carry the QUERY_LEDGER_BEGIN/END markers (§2.12)")
    val block = text.substring(begin, end)
    "`([a-z0-9_]+)`".r.findAllMatchIn(block).map(_.group(1)).toSet
  }

  test("every SparkEntry.queries key is inventoried in SURVEY §2.12") {
    val missing = SparkEntry.queries.keySet -- ledgerNames
    assert(missing.isEmpty,
      s"queries missing from the SURVEY §2.12 ledger: " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every SURVEY §2.12 ledger entry is a live registry query") {
    val stale = ledgerNames -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"SURVEY §2.12 ledger names with no registry query (removed or " +
        s"renamed?): " + stale.toSeq.sorted.mkString(", "))
  }

  test("the SURVEY §2.12 ledger lists every query exactly once") {
    // A name appearing twice in the ledger was the visible fingerprint
    // of round 9's Map-literal key collision (set-based compares are
    // blind to it) — fail on ANY repeated occurrence.
    val text = new String(java.nio.file.Files.readAllBytes(SurveyPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val begin = text.indexOf("<!-- QUERY_LEDGER_BEGIN -->")
    val end = text.indexOf("<!-- QUERY_LEDGER_END -->")
    val block = text.substring(begin, end)
    val all = "`([a-z0-9_]+)`".r.findAllMatchIn(block).map(_.group(1)).toSeq
    val dups = all.groupBy(identity).collect {
      case (k, vs) if vs.sizeIs > 1 => k
    }
    assert(dups.isEmpty, "ledger names listed more than once: " +
      dups.toSeq.sorted.mkString(", "))
  }

  test("every no-oracle query row is documented in specOnly") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = noOracle -- SparkEntry.specOnly.keySet
    assert(undocumented.isEmpty,
      s"queries without an oracle AND without a specOnly entry: " +
        undocumented.toSeq.sorted.mkString(", "))
  }

  test("every spec class cited in SURVEY or SparkEntry.specOnly " +
    "exists on the test classpath") {
    // Spec-only rows were still prose: a row could cite `FooSpec` that
    // was renamed or never written and nothing would fail. Every
    // CamelCase *Spec token in SURVEY and in the specOnly evidence map
    // must resolve as a class in this package.
    val text = new String(java.nio.file.Files.readAllBytes(SurveyPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val cited =
      ("""\b([A-Z][A-Za-z0-9]*Spec)\b""".r.findAllMatchIn(text) ++
        SparkEntry.specOnly.values.flatMap(
          """\b([A-Z][A-Za-z0-9]*Spec)\b""".r.findAllMatchIn(_)))
        .map(_.group(1)).toSet
    assert(cited.nonEmpty, "no spec citations found — parser broken?")
    val missing = cited.filter { name =>
      try { Class.forName(s"graft.$name"); false }
      catch { case _: ClassNotFoundException => true }
    }
    assert(missing.isEmpty,
      "cited spec classes that do not exist on the test classpath: " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("every SparkEntry.specOnly key maps back to a SURVEY row or a " +
    "live query") {
    // The reverse direction: a specOnly entry whose X/S ids vanished
    // from SURVEY (renumbered, dropped) is evidence pointing nowhere.
    // Keys carry either leading X/S row ids (X39_..., S1_S3_S4_...) —
    // each id must head a `| Xnnn |`/`| Snn |` row — or are plain
    // query names, which must be live registry keys.
    val text = new String(java.nio.file.Files.readAllBytes(SurveyPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val rowIds = text.linesIterator
      .collect { case l if l.matches("^\\| [XS]\\d+ \\|.*") =>
        l.drop(2).takeWhile(_ != ' ') }
      .toSet
    val bad = SparkEntry.specOnly.keySet.flatMap { key =>
      val ids = key.split("_").takeWhile(_.matches("[XS]\\d+")).toSeq
      if (ids.nonEmpty) ids.filterNot(rowIds).map(id => s"$key -> $id")
      else if (!SparkEntry.queries.contains(key)) Seq(s"$key (no query)")
      else Nil
    }
    assert(bad.isEmpty,
      "specOnly entries whose SURVEY row id or query is gone: " +
        bad.toSeq.sorted.mkString(", "))
  }

  test("every §2.11 X-row's query-name column references live " +
    "registry queries (or is an explicit spec-only marker)") {
    // The §2.12 ledger is machine-checked, but the X-rows' last
    // column was only prose — exactly where the r9 key-collision hid
    // (X97/X123 claimed query names whose bindings were dead). Parse
    // each `| Xnnn | ... |` row; every backticked name in its LAST
    // cell must be a live query. Rows whose last cell carries no
    // backticks are the documented spec-only/audited exceptions.
    val text = new String(java.nio.file.Files.readAllBytes(SurveyPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val rows = text.linesIterator.filter(_.matches("^\\| X\\d+ \\|.*"))
      .toSeq
    assert(rows.nonEmpty, "no §2.11 X-rows found")
    val bad = rows.flatMap { r =>
      val cells = r.split("(?<!\\\\)\\|").map(_.trim).filter(_.nonEmpty)
      val xid = cells.head.takeWhile(_ != ' ')
      val last = cells.last
      "`([a-z0-9_]+)`".r.findAllMatchIn(last).map(_.group(1))
        .filterNot(SparkEntry.queries.contains)
        .map(n => s"$xid -> $n").toSeq
    }
    assert(bad.isEmpty,
      "X-rows naming queries that do not exist in the registry: " +
        bad.sorted.mkString(", "))
  }
}
