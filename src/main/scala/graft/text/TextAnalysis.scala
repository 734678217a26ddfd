package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for the training-data pipeline surface:
  * language-ID (n-gram/stopword heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * Everything is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` (no UDFs) so it stays inside
  * whole-stage codegen and scales as embarrassingly-parallel map work —
  * no shuffle is introduced by any function here.
  *
  * Cross-engine determinism: each expression has an exact DuckDB-SQL
  * equivalent (see `graft.registry.TextQueries`), so every operator is
  * oracle-checkable. Hashing uses MD5 (identical hex output in both
  * engines) and 31-polynomial rolling hashes over code points.
  */
object TextAnalysis {

  /** Lower-case and strip everything but letters, digits and single
    * spaces — the canonical form used by fingerprints and dedup. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Whitespace tokens of the trimmed text ([[WsPlusPattern]] — the
    * explicit class, not `\s`, for cross-engine identity). */
  def tokens(text: Column): Column = split(trim(text), WsPlusPattern)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "", lit(0L))
      .otherwise(size(tokens(text)).cast("long"))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * non-alphanumeric marks each count as one token — a cheap proxy for
    * subword tokenizer cost used to budget training data. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Ratio of punctuation characters to total non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, WsClassPattern, ""))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(nonSpace === 0, lit(0.0))
      .otherwise(punct.cast("double") / nonSpace.cast("double"))
  }

  /** Per-language marker-word ("stopword") lists for the n-gram
    * language-ID heuristic. Public common function words per language;
    * deterministic, data-independent. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  private def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*))).cast("double")

  /** Stopword ratio against the English marker list (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(trim(text) === "", lit(0.0)).otherwise(
      markerHits(toks, LangMarkers.head._2) / size(toks).cast("double"))
  }

  /** Language-ID: argmax of marker-hit counts across languages, with a
    * fixed priority order for ties and "und" (undetermined) when no
    * marker hits at all. Heuristic shape per public fastText/CLD-style
    * frequency scoring, reduced to expression form. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = LangMarkers.map { case (l, ms) => l -> markerHits(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("und"))) { case (acc, (l, s)) =>
      acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents,
    * presence of stopwords, and low punctuation density — the classic
    * heuristic trio of C4/Gopher-style quality filters. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round(lenScore * 0.4 + stopScore * 0.3 + punctScore * 0.3, 6)
  }

  /** Whole-document fingerprint: MD5 of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Rolling polynomial fingerprint over the first `maxChars` code
    * points of the normalized text: h = (h*31 + cp) mod 2^31-1.
    * Bounded prefix keeps the per-row cost O(maxChars) at any document
    * length (the substring-per-char expansion is quadratic otherwise). */
  def rollingFingerprint(text: Column, maxChars: Int = 64): Column = {
    val t = substring(normalize(text), 1, maxChars)
    // sequence(1, 0) is DESCENDING [1,0] in Spark — guard the empty case
    val codes = when(length(t) === 0, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), length(t)),
        i => ascii(substring(t, i, lit(1))).cast("long")))
    aggregate(codes, lit(0L), (acc, x) => (acc * 31 + x) % 2147483647L)
  }

  /** Word n-gram shingles of an already-materialized token ARRAY
    * column (n consecutive words joined by a single space); empty
    * array when fewer than n words. `w` should be a plain attribute
    * (a staged projection or cached column): `element_at` on an
    * attribute is O(1) per lambda invocation, so the whole shingle
    * array is linear in document length. */
  def wordShinglesOf(w: Column, n: Int): Column = {
    val cnt = size(w) - (n - 1)
    when(cnt < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
  }

  /** Word n-gram shingles straight from raw text. ONLY for tiny/ad-hoc
    * frames: the split-of-normalized-text sub-expression sits inside
    * the per-element lambda, where interpreted evaluation recomputes it
    * at every `element_at` reference — quadratic per document (measured
    * 140× on the corpus bench). Corpus-scale callers must stage the
    * token array as its own projection/cache column and use
    * [[wordShinglesOf]]. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(split(normalize(text), " "), n)

  /** Encoding/mojibake ingest QC (X252) — the pre-LM screen a
    * CCNet/C4-style pipeline runs FIRST: a document whose bytes were
    * decoded with the wrong charset surfaces as U+FFFD replacement
    * characters and stray C0/C1 control characters, and feeding it to
    * a tokenizer just trains the model on transcoding noise. The C0
    * class excludes TAB/LF/CR (legitimate whitespace); DEL (U+007F)
    * and the full C1 block (U+0080–U+009F, the classic latin-1-vs-
    * cp1252 mojibake residue) are included. Counts are computed as
    * length(text) − length(strip(text)) — a single-pass codegen'd
    * regexp_replace, no UDF — and the same class expression (shared
    * constant) drives the DuckDB oracle, so the two engines cannot
    * drift. A document is quarantined when it carries ANY replacement
    * character or ≥ [[CtrlPpmQuarantine]] ppm control characters.
    *
    * Scale: pure map work, zero shuffle; the per-source rollup is one
    * map-side-combinable aggregate at |sources| grain. */
  val CtrlPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"
  val CtrlPpmQuarantine = 1000L

  /** Count of U+FFFD replacement characters. */
  def replacementCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\uFFFD", ""))).cast("long")

  /** Count of disallowed C0/C1 control characters (see [[CtrlPattern]]). */
  def ctrlCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, CtrlPattern, ""))).cast("long")

  /** Gopher-rule document screen (X254) — the published repertoire of
    * cheap structural filters (Rae et al. 2021, "Scaling Language
    * Models: ... Gopher", Table A1): word-count bounds, mean-word-
    * length band, minimum share of words containing an alphabetic
    * character, minimum distinct stopword hits, and a symbol-to-word
    * cap for '#' and '...' (the scraped-markup tell). All measures are
    * integer (ppm / µchars via `x·10⁶ div words`) so the verdict
    * replays bit-identically in the oracle; the float-free verdict is
    * the point — a quality GATE must not flap on summation order.
    * Thresholds are the published Gopher values, shared constants
    * driving both engines. Pure map work, zero shuffle. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinWlenE6 = 3000000L
  val GopherMaxWlenE6 = 10000000L
  val GopherMinAlphaPpm = 800000L
  val GopherMinStopHits = 2L
  val GopherMaxSymPpm = 100000L

  /** Explicit ASCII whitespace class shared by BOTH engines. Java's
    * `\s` includes U+000B (vertical tab); RE2/DuckDB's excludes it —
    * the exact cross-engine divergence [[AnchorPattern]] documents. An
    * explicit class interpolated into both the Spark expression and
    * the oracle SQL makes the two regexes character-identical, so a
    * document carrying a vertical tab scores the same word_chars on
    * both sides. */
  val WsClassPattern = "[ \\t\\n\\x0B\\f\\r]"

  /** One-or-more repetition of [[WsClassPattern]] — the tokenizer's
    * split pattern, shared with every oracle's `string_split_regex`. */
  val WsPlusPattern = WsClassPattern + "+"

  /** Total non-whitespace characters (= summed word lengths). */
  def wordChars(text: Column): Column =
    length(regexp_replace(text, WsClassPattern, "")).cast("long")

  /** Count of whitespace words containing at least one ASCII letter. */
  def alphaWordCount(text: Column): Column =
    when(trim(text) === "", lit(0L)).otherwise(
      size(filter(tokens(text), t => t.rlike("[A-Za-z]"))).cast("long"))

  /** Distinct hits against the English marker list (0..8). */
  def stopwordHits(text: Column): Column = {
    val toks = tokens(lower(text))
    LangMarkers.head._2
      .map(m => when(array_contains(toks, m), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** Occurrences of '#' plus non-overlapping '...' runs. */
  def symbolCount(text: Column): Column =
    ((length(text) - length(regexp_replace(text, "#", ""))) +
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
      .cast("long")

  /** Markup-density / boilerplate screen (X256) — the jusText/
    * trafilatura-style structural read the quality trio (X10) is blind
    * to: a document that is 80% HTML tags scores as "punctuation-heavy
    * prose" under char-class ratios, and scraped link farms pass a
    * stopword check on their anchor text alone. Three integer signals
    * per document, all from single-pass codegen'd regexes whose
    * pattern constants drive BOTH engines:
    *
    *  - tag ppm: characters consumed by `<...>` tag spans
    *    ([[TagPattern]]) over total characters — the raw markup load;
    *  - link ppm: characters of anchor INNER text ([[AnchorPattern]]
    *    group 1, concatenated) over tag-stripped visible characters —
    *    jusText's link-density signal (its published
    *    MAX_LINK_DENSITY = 0.2 is [[LinkPpmBoiler]]);
    *  - the boilerplate verdict: tag ppm ≥ [[TagPpmBoiler]] OR link
    *    ppm ≥ [[LinkPpmBoiler]].
    *
    * Anchor inner text that itself contains markup counts toward both
    * signals — deterministic and identical in both engines, and the
    * conservative direction for a quarantine screen. All ratios are
    * integer (`x·10⁶ div chars`) so the GATE cannot flap on float
    * order. Pure map work, zero shuffle. */
  val TagPattern = "<[^>]*>"
  // explicit whitespace class, not \s: Java's \s includes \x0B where
  // RE2's does not, and the fixture deliberately plants control chars
  val AnchorPattern = "(?si)<a(?:[ \\t\\n\\r][^>]*)?>(.*?)</a>"
  val TagPpmBoiler = 300000L
  val LinkPpmBoiler = 200000L

  /** Characters consumed by `<...>` tag spans. */
  def tagChars(text: Column): Column =
    (length(text) - length(regexp_replace(text, TagPattern, ""))).cast("long")

  /** Count of `<...>` tag spans. */
  def tagCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TagPattern), lit(0))).cast("long")

  /** Total characters of anchor inner text (all `<a>...</a>` spans). */
  def linkChars(text: Column): Column =
    length(array_join(
      regexp_extract_all(text, lit(AnchorPattern), lit(1)), "")).cast("long")
}
