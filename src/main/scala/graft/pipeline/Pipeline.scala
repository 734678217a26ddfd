package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis._

/** Training-data curation operators a large-scale LLM pipeline runs
  * between dedup and training: deterministic train/valid/test
  * splitting, PII redaction, benchmark decontamination, and sequence
  * packing. All pure DataFrame transforms — per-row work stays inside
  * whole-stage codegen; the only shuffles are the per-doc aggregates
  * and the bounded window sort in packing.
  *
  * Cross-engine determinism: every derivation (hash buckets, regexes,
  * shingles, window frames) has an exact DuckDB equivalent generated
  * from the same constants in `graft.registry.PipelineQueries`.
  */
object Pipeline {

  // ---- deterministic hash split / sampling ----

  /** Split thresholds on the 0-99 hash bucket: `< TrainPct` → train,
    * `< TrainPct+ValidPct` → valid, else test. */
  val TrainPct = 80
  val ValidPct = 10

  /** Stable 0-99 bucket from the id: first 8 hex digits of
    * md5(id-as-string), mod 100. Content-independent, so re-running
    * the pipeline over a grown corpus never moves an old doc across
    * splits — the property random() sampling lacks. Pure map work. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Deterministic train/valid/test assignment per document. */
  def hashSplit(docs: DataFrame, trainPct: Int = TrainPct,
      validPct: Int = ValidPct): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
        hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + validPct, lit("valid"))
          .otherwise(lit("test")))

  /** Train/eval split-leakage audit — the contamination check INSIDE
    * the corpus (decontamination X17 guards against external
    * benchmarks; this guards the held-out split against the training
    * split): near-duplicate pairs whose members land in DIFFERENT
    * splits are eval examples the model has effectively seen — the
    * standard reason hash-split corpora still leak (near-dups hash to
    * independent buckets). Composes the X3 LSH pair set with the
    * deterministic hash split: two equi-joins on doc_id, a
    * cross-split predicate, no new heavy derivation — and under
    * Bench/Verify the pair set is the session-shared cache, so the
    * audit costs two hash joins. */
  def splitLeakage(docs: DataFrame,
      pairs: Option[DataFrame] = None): DataFrame = {
    val p = pairs.getOrElse(graft.dedup.Dedup.minhashLshPairs(docs))
    val s = hashSplit(docs).select(col("doc_id"), col("split"))
    p.join(s.withColumnsRenamed(
        Map("doc_id" -> "a_id", "split" -> "a_split")), Seq("a_id"))
      .join(s.withColumnsRenamed(
        Map("doc_id" -> "b_id", "split" -> "b_split")), Seq("b_id"))
      .filter(col("a_split") =!= col("b_split"))
      .select(col("a_id"), col("b_id"), col("a_split"), col("b_split"),
        col("est_jaccard"))
  }

  /** Stratification report over the split: doc and char volumes per
    * (split, lang) — the sanity check run before shipping a split.
    * One partial-aggregated shuffle on a tiny key space. */
  def splitReport(docs: DataFrame): DataFrame =
    hashSplit(docs)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

  /** Sample-ratio-mismatch audit (X198) — the A/B-testing guard
    * applied to the deterministic hash split: a biased assignment
    * (skewed hash, filtered upstream, collided buckets) silently
    * invalidates every downstream eval, and the standard detector is
    * the SRM chi-square over observed vs declared split counts. All
    * integer: per split, `d = 100·n_obs − n_total·pct` is the exact
    * scaled deviation from expectation, `dev_ppm = |d|·10⁶ div
    * (n_total·pct)` the relative miss, and the chi-square contribution
    * `(obs−e)²/e = d²/(100·n·pct)` is emitted in e6 units via the
    * divide-first spelling `d² div ((100·n·pct) div 10⁶)` (multiplying
    * d² by 10⁶ first would overflow Long immediately). Long-exactness
    * asserted: `|d| ≤ 3.03·10⁹` — past that (a >30% miss on a 10⁹-row
    * split) the audit has long since failed anyway.
    *
    * Scale shape: one map-side-combinable count at split grain (3
    * rows), a broadcast of the 3-row declared-ratio frame, one 1-row
    * total broadcast. The split assignment is the same
    * [[hashBucket]] every other split consumer shares. */
  def srmAudit(docs: DataFrame, trainPct: Int = TrainPct,
      validPct: Int = ValidPct): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = hashSplit(docs, trainPct, validPct)
      .groupBy(col("split")).agg(count(lit(1)).cast("long").as("n_obs"))
    val meta = broadcast(Seq(("train", trainPct.toLong),
        ("valid", validPct.toLong),
        ("test", (100 - trainPct - validPct).toLong))
      .toDF("split", "expected_pct"))
    meta.join(counts, Seq("split"), "left")
      .select(col("split"), col("expected_pct"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(counts
        .agg(sum(col("n_obs")).cast("long").as("n_total"))))
      .withColumn("d", expr(
        "100 * n_obs - n_total * expected_pct"))
      .select(col("split"), col("expected_pct"), col("n_obs"),
        col("n_total"),
        expr("coalesce(cast(assert_true(abs(d) <= 3037000499, " +
          "'SRM deviation exceeds the Long-exact chi-square range: " +
          "move to decimal(38)') as bigint), 0) + " +
          "(abs(d) * 1000000) div greatest(n_total * expected_pct, 1)")
          .cast("long").as("dev_ppm"),
        expr("(d * d) div greatest(" +
          "(100 * n_total * expected_pct) div 1000000, 1)")
          .cast("long").as("chi2_e6"))
  }

  /** Resharding schemes compared by [[shardMoveAudit]]. */
  val ShardsFrom = 8
  val ShardsTo = 10

  /** Consistent-hash resharding audit (X210) — "what does growing
    * 8 → 10 shards cost": under mod-hashing (`h % n`) almost every
    * key moves when n changes; under rendezvous hashing (HRW,
    * Thaler & Ravishankar 1998 — each key goes to the shard with the
    * highest per-(key, shard) hash) only the keys the NEW shards win
    * move, ≈ (m−n)/m. The audit computes both movement fractions
    * EXACTLY over the real key domain, which is the number a platform
    * team needs before a shard split (cache invalidation volume,
    * rebalance traffic).
    *
    * Determinism device: the rendezvous argmax is encoded into one
    * integer — `score = h·16 + (15 − s)` (unique per (h, s), max
    * picks highest hash then SMALLEST shard) — so both engines argmax
    * with a plain integer MAX and recover `s = 15 − score mod 16`;
    * no struct aggregates, no unspecified arg_max tie semantics.
    * Requires m ≤ 16 (the 4-bit tiebreak field).
    *
    * Scale shape: pure map work over the distinct key domain plus a
    * bounded ×m explode for the rendezvous scores, one key-grain
    * aggregate, and a 2-row verdict. */
  def shardMoveAudit(df: DataFrame, keyCol: String,
      nFrom: Int = ShardsFrom, nTo: Int = ShardsTo): DataFrame = {
    require(nTo <= 16 && nFrom < nTo, "score tiebreak field is 4 bits")
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull).distinct()
    def h(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def verdict(name: String, fr: Column, to: Column)(src: DataFrame) =
      src.select(when(fr =!= to, 1L).otherwise(0L).as("moved"))
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(col("moved")).cast("long").as("n_moved"))
        .select(lit(name).as("scheme"), col("n_keys"), col("n_moved"),
          expr("(n_moved * 1000000) div greatest(n_keys, 1)")
            .cast("long").as("moved_ppm"))
    val mod = verdict("mod", col("hk") % nFrom, col("hk") % nTo)(
      keys.select(h(col("key")).as("hk")))
    val rdv = verdict("rendezvous",
      lit(15L) - col("cf") % 16, lit(15L) - col("ct") % 16)(
      keys
        .select(col("key"),
          explode(array((0 until nTo).map(lit): _*)).as("s"))
        .select(col("key"), col("s"),
          (h(concat(col("key"), lit("|"), col("s"))) * 16 +
            (lit(15) - col("s"))).as("score"))
        .groupBy(col("key"))
        .agg(max(when(col("s") < nFrom, col("score"))).as("cf"),
          max(col("score")).as("ct")))
    mod.unionByName(rdv)
  }

  /** Per-language keep-rates (percent of the 0-99 bucket) for
    * stratified sampling — the language-rebalancing knob multilingual
    * corpus curation turns (downsample the dominant language, keep the
    * long tail whole). Unlisted languages use [[DefaultRate]]. */
  val StratRates: Seq[(String, Int)] =
    Seq("en" -> 50, "de" -> 80, "zh" -> 100)
  val DefaultRate = 30

  /** Deterministic stratified sample: keep a doc iff its hash bucket
    * falls under its language's rate. Same md5 bucket as [[hashSplit]]
    * — content-stable, re-runnable, and pure map work (the rate lookup
    * folds into a CASE expression, no join). */
  def stratifiedSample(docs: DataFrame,
      rates: Seq[(String, Int)] = StratRates,
      defaultRate: Int = DefaultRate): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id")).as("bucket"), rate.as("keep_rate"))
      .filter(col("bucket") < col("keep_rate"))
  }

  // ---- temperature-based language rebalancing ----

  /** Temperature exponent α = 0.5 — deliberately the ONE exponent whose
    * `pow` is an exactly-specified IEEE 754 operation (`sqrt`), so the
    * data-dependent keep-rates below are bit-identical in Spark/JVM and
    * the DuckDB oracle with no interpolated constants. Other α values
    * would route through libm `pow` and its last-ulp variance. */
  val TempTargetFrac = 0.5

  /** Fine bucket for fractional keep-rates: same content-stable md5
    * prefix as [[hashBucket]], mod 1e6. */
  def hashBucketE6(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000

  /** Per-language keep thresholds (integer ppm of [[hashBucketE6]]) for
    * temperature sampling at α = 0.5: sample share q_l ∝ p_l^α, so
    * keep_rate_l = F · q_l / p_l — the multilingual rebalancing rule
    * (downsample the head language, keep the tail) with the mixture
    * temperature of the mT5/XLM-R line of work. Rates above 1 cap at 1
    * (a language can't be upsampled by filtering; the realized total
    * then lands slightly under F — standard and documented behavior).
    *
    * Determinism: the histogram is tiny (one row per language) and is
    * folded in SORTED language order through `sqrt`/`+`/`/`/`*` only —
    * every step exactly specified by IEEE 754 — so the oracle SQL
    * recomputes the identical thresholds from the same table. */
  def temperatureThresholds(docs: DataFrame,
      targetFrac: Double = TempTargetFrac): Seq[(String, Long)] = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum.toDouble
    val s = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.sqrt(n / total)
    }
    counts.map { case (l, n) =>
      val p = n / total
      val r = targetFrac * math.sqrt(p) / s / p
      l -> math.min(math.floor(r * 1000000.0 + 0.5).toLong, 1000000L)
    }.toSeq
  }

  /** Epoch bar for [[mixEpochs]]' repeat-risk flag: past ~4 passes
    * over the same tokens, repetition stops substituting for fresh
    * data (the Muennighoff et al. 2023 data-constrained-scaling
    * observation), so a mix demanding more is a curation smell. */
  val MaxHealthyEpochsE6 = 4000000L

  /** X306: mixture-epochs report — the planning table the temperature
    * mix implies: [[temperatureThresholds]] answers "what keep-rate
    * downsamples each language", this answers the dual question a
    * budget-sized training run asks: for a ONE-CORPUS token budget
    * mixed at α = ½ (target share ∝ √p), how many PASSES over each
    * language's tokens does the mix demand (`epochs = share/p` —
    * > 1 epoch = upsampled rare language, repeated data; < 1 =
    * downsampled head), with the repeat-risk flag past
    * [[MaxHealthyEpochsE6]].
    *
    * Determinism: the α = ½ arithmetic is the proven IEEE-exact
    * chain (sqrt, the lang-ordered left-fold sum, two divisions, the
    * e6 floor quantization — every step an exactly-specified IEEE op
    * replayed in the same order by the oracle). Token counts per
    * language are one map + hash aggregate; the per-language fold is
    * a bounded |langs|-row driver pass (the
    * [[temperatureThresholds]] device). */
  def mixEpochs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ADVICE r14: a language whose docs all tokenize to zero gives
    // p = 0 and share/p = Inf (Long.MaxValue after the floor) while
    // the oracle's CAST errors — drop n = 0 languages before the
    // fold. sqrt(0/N) = 0 contributes exactly 0.0 to the IEEE fold
    // and 0 to the total, so the surviving rows are unchanged; the
    // oracle mirrors with HAVING n > 0.
    val counts = docs
      .select(col("lang"), tokenCount(col("text")).as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0L).sortBy(_._1)
    val total = counts.map(_._2).sum.toDouble
    val s = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.sqrt(n / total)
    }
    val rows = counts.map { case (l, n) =>
      val p = n / total
      val share = math.sqrt(p) / s
      val sharePpm = math.floor(share * 1000000.0 + 0.5).toLong
      val epochsE6 = math.floor(share / p * 1000000.0 + 0.5).toLong
      (l, n, sharePpm, epochsE6,
        if (epochsE6 > MaxHealthyEpochsE6) 1L else 0L)
    }.toSeq
    rows.toDF("lang", "n_tokens", "target_share_ppm", "epochs_e6",
      "repeat_risk")
  }

  /** Deterministic temperature sample: keep a doc iff its e6 hash
    * bucket falls under its language's threshold. The rate lookup folds
    * into a CASE (no join); the only non-map work is the one tiny
    * language histogram behind [[temperatureThresholds]]. */
  def temperatureSample(docs: DataFrame,
      targetFrac: Double = TempTargetFrac): DataFrame = {
    val th = temperatureThresholds(docs, targetFrac)
    val thr = th.foldLeft(lit(0L): Column) { case (acc, (l, t)) =>
      when(col("lang") === l, lit(t)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"),
        hashBucketE6(col("doc_id")).as("bucket_e6"),
        thr.as("keep_thresh_e6"))
      .filter(col("bucket_e6") < col("keep_thresh_e6"))
  }

  // ---- PII redaction ----

  /** Conservative PII patterns (identical semantics in Java regex and
    * DuckDB's RE2): emails, +NN-prefixed phone numbers, IPv4s. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{4}"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Deterministic contact-info suffix appended to each document so the
    * redaction rules demonstrably fire on the synthetic corpus (whose
    * text contains no PII); built from doc_id only, with the identical
    * expression in the oracle SQL. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@example.com or +1 555-01"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
      lit(".7")).as("raw"))

  /** Redact emails → `<EMAIL>`, phones → `<PHONE>`, IPv4s → `<IP>`,
    * and count each class (the audit trail a curation pipeline keeps).
    * Order matters and is fixed: emails first (their dotted domains
    * would otherwise be half-eaten by the IP rule), then phones, then
    * IPs. Pure per-row regex work — no shuffle at all. */
  def piiRedact(docs: DataFrame): DataFrame =
    withSyntheticPii(docs).select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        IpRe, "<IP>").as("clean_text"),
      size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(col("raw"), lit(IpRe), lit(0)))
        .cast("long").as("n_ips"))

  // ---- benchmark decontamination ----

  /** Docs with `doc_id % BenchMod == 0` stand in for the held-out
    * benchmark/eval set; everything else is the training corpus. */
  val BenchMod = 50
  val MinContamOverlap = 0.2

  /** Benchmark decontamination: fraction of each training document's
    * word-[[graft.dedup.Dedup.ShingleN]]-gram shingles that appear
    * anywhere in the benchmark set — the standard n-gram-overlap
    * contamination check run before training.
    *
    * Scale shape: the benchmark shingle vocabulary is bounded by the
    * (small, fixed) eval-set size, so it is `broadcast()` and the
    * probe is a map-side hash join over the corpus shingles — the
    * corpus is never shuffled on the shingle key; the only shuffle is
    * the per-doc count aggregate. Survives a 100× corpus unchanged.
    *
    * `shingles`: callers whose `docs` IS the documents table pass the
    * session shingle tier ([[graft.dedup.Dedup.sharedShingles]]) so a
    * sweep pays the tokenize→shingle regex passes once, not once per
    * consuming query (guide §2.4 — share one derivation; r16:
    * pipe_decontaminate / pipe_curated_corpus / pipe_manifest each
    * re-derived it). Same optional-tier seam as every dedup operator. */
  def decontaminate(docs: DataFrame, benchMod: Int = BenchMod,
      minOverlap: Double = MinContamOverlap,
      shingles: Option[DataFrame] = None): DataFrame = {
    val ss = shingles.getOrElse(graft.core.CacheBay.register(
      graft.dedup.Dedup.shingleSets(docs)))
    val ex = ss.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val bench = ex.filter(col("doc_id") % benchMod === 0)
      .select(col("sh")).distinct()
      .withColumn("__hit", lit(1))
    val agg = ex.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
    // overlap emitted as INTEGER parts-per-million: round(exact
    // rational, 6) diverges cross-engine at decimal ties (e.g. 41/640
    // → Spark .064063, DuckDB .064062); integer div has no ties. The
    // flag's >= threshold compares one exact double division — no
    // rounding involved, so it stays deterministic.
    agg.select(col("doc_id"), col("n_sh"), col("n_hit"),
      expr("(n_hit * 1000000) div n_sh").as("overlap_e6"),
      when(col("n_hit").cast("double") / col("n_sh") >= minOverlap, 1L)
        .otherwise(0L).as("contaminated"))
  }

  /** Token-level contamination SPANS — the surgical sequel to
    * [[decontaminate]]'s doc-level verdict: for every training doc
    * with ≥ 1 benchmark-shingle hit, WHERE the overlap sits. Runs of
    * consecutive hit positions (gaps-and-islands on `pos − row_number`)
    * distinguish one long verbatim benchmark quote (high
    * `max_span_tokens`, few spans — excise the span, keep the doc)
    * from scattered common trigrams (many 1-shingle spans — likely a
    * false positive). Emits per-doc hit ppm, span count, longest span
    * in shingles and tokens, and the first hit position.
    *
    * Shape: the benchmark shingle vocabulary is eval-set-bounded →
    * `broadcast`; the probe is a map-side join over positioned corpus
    * shingles; runs are one window + aggregate partitioned by doc
    * (per-doc hit lists are doc-length-bounded). Linear, no corpus
    * shuffle on the shingle key. */
  def contaminationSpans(docs: DataFrame,
      benchMod: Int = BenchMod): DataFrame = {
    val n = graft.dedup.Dedup.ShingleN
    val toks = graft.core.CacheBay.register(
      docs.select(col("doc_id"),
        graft.text.CorpusStats.tokenArray(col("text")).as("w")))
    val shp = graft.core.CacheBay.register(
      toks.select(col("doc_id"), posexplode(wordShinglesOf(col("w"), n)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("sh")))
    val bench = shp.filter(col("doc_id") % benchMod === 0)
      .select(col("sh")).distinct()
    val hits = shp.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("sh"))
      .select(col("doc_id"), col("pos"))
    val runs = hits
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))).cast("long"))
      .withColumn("grp", col("pos") - col("rn"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).cast("long").as("run_len"),
        min(col("pos")).as("start_pos"))
    val perDoc = runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        max(col("run_len")).as("max_run"),
        min(col("start_pos")).cast("long").as("first_pos"),
        sum(col("run_len")).cast("long").as("n_hit"))
    val tot = shp.filter(col("doc_id") % benchMod =!= 0)
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n_sh"))
    perDoc.join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        expr("(n_hit * 1000000) div n_sh").as("hit_ppm"),
        col("n_spans"), col("max_run").as("max_span_shingles"),
        (col("max_run") + (n - 1)).cast("long").as("max_span_tokens"),
        col("first_pos"))
  }

  /** Span EXCISION — the actionable output [[contaminationSpans]]
    * diagnoses (X90 reports WHERE the benchmark quotes sit; this
    * emits the decontaminated text with those spans REMOVED — the
    * step a pipeline actually ships): a token is contaminated iff any
    * hit shingle's [pos, pos+n−1] window covers it. Coverage expands
    * each hit into its n token positions (a bounded `sequence`
    * explode — n rows per hit, never a range join), the keep-set is a
    * doc+position ANTI-join, and the text reassembles with
    * `array_sort(collect_list(struct(pos, tok)))` — deterministic
    * order, mirrored by the oracle's `string_agg(… ORDER BY)`. Output
    * text is in the normalized token form (the same canonical form
    * every dedup/contamination operator matches on). Bench docs
    * (doc_id % benchMod = 0) are the benchmark side, not emitted. */
  def exciseContamination(docs: DataFrame,
      benchMod: Int = BenchMod): DataFrame = {
    val n = graft.dedup.Dedup.ShingleN
    val toks = graft.core.CacheBay.register(
      docs.select(col("doc_id"),
        graft.text.CorpusStats.tokenArray(col("text")).as("w")))
    val shp = graft.core.CacheBay.register(
      toks.select(col("doc_id"), posexplode(wordShinglesOf(col("w"), n)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("sh")))
    val bench = shp.filter(col("doc_id") % benchMod === 0)
      .select(col("sh")).distinct()
    val covered = shp.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("sh"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
      .distinct()
    val tokens = toks.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), posexplode(col("w")))
      .select(col("doc_id"), col("pos").cast("long").as("tp"),
        col("col").as("tok"))
    val kept = tokens.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    toks.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Per-source quality calibration — percentile-rank normalization
    * WITHIN each source (the cross-source comparability step before
    * any global quality cut: raw quality scores are source-biased —
    * a clean curated feed's 40th percentile can outscore a crawl's
    * 95th — so mixing decisions should compare a doc to ITS OWN
    * source's distribution, the quality-classifier-calibration move
    * every multi-source mix makes): `pct_ppm = ((rk−1)·10⁶) div
    * (n−1)` over the (quality desc → rank asc? no — quality ASC, id
    * tiebreak) order, 0 for a single-doc source (no distribution to
    * rank against). Integer-exact; one window per the bounded source
    * key; composes with X38's budget selection as the calibrated
    * alternative ranking. */
  def sourceCalibratedQuality(docs: DataFrame,
      scored: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scored.getOrElse(qualityScored(docs))
      .select(col("source"), col("doc_id"), col("quality_e6"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_e6"), col("doc_id"))
    base
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("source"))).cast("long"))
      .select(col("source"), col("doc_id"), col("quality_e6"),
        when(col("n") === 1, lit(0L))
          .otherwise(expr("((rk - 1) * 1000000) div (n - 1)"))
          .as("pct_ppm"))
  }

  /** Boundary rate for [[contentChunks]]: a token whose hash ≡ 0
    * (mod this) ends its chunk → mean chunk length ≈ this many
    * tokens. */
  val ChunkBoundaryMod = 16

  /** Content-defined chunking — the dedup-stable chunker (the FastCDC/
    * rsync idea at token granularity): chunk boundaries are TOKENS
    * whose hash ≡ 0 (mod [[ChunkBoundaryMod]]), so boundaries are a
    * function of CONTENT, not position. Insert a paragraph at the top
    * of a document and a fixed-stride chunker ([[chunkWithOverlap]])
    * shifts every window — every chunk fingerprint changes; here every
    * chunk after the first post-insertion boundary is byte-identical,
    * which is what makes chunk-level exact dedup across near-identical
    * documents (boilerplate headers, versioned pages) actually fire.
    * The boundary hash is the md5-hex8 integer (the [[graft.dedup
    * .Dedup]] base-hash device), exactly replayable in SQL.
    *
    * Shape: one posexplode, per-token hash + flag inside built-ins, a
    * doc-partitioned running count (window bounded by doc length), one
    * (doc, chunk) aggregate whose `array_sort(collect_list)` makes
    * collect order irrelevant. Linear; no cross-doc state. */
  def contentChunks(docs: DataFrame,
      mod: Int = ChunkBoundaryMod): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        posexplode(graft.text.CorpusStats.tokenArray(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
    val hex8 = expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)")
    val flagged = toks.withColumn("b",
      when(pmod(hex8, lit(mod.toLong)) === 0, 1L).otherwise(0L))
    // a boundary token ENDS its chunk: chunk id = boundaries strictly
    // before this position
    flagged.withColumn("chunk_id",
      coalesce(sum(col("b")).over(Window.partitionBy(col("doc_id"))
        .orderBy(col("pos")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ")).as("chunk_md5"))
  }

  // ---- sequence packing ----

  /** Token budget per packed training sequence and the number of
    * independent packing partitions. */
  val PackBudget = 512L
  val PackParts = 16

  /** Assign each document to a packed training sequence: documents are
    * concatenated in doc_id order and chunked every `budget` tokens
    * (whitespace [[tokenCount]]); `pack_id` is the chunk in which the
    * document STARTS — the concat-and-chunk packing LLM data prep uses.
    *
    * Packing is scoped to `doc_id % nParts` partitions, so the running
    * sum is a window over each partition, never a single global sort:
    * the sort key is (part, doc_id) and the work parallelizes across
    * nParts — on a cluster, nParts rises with executor count and the
    * shape is unchanged. pack_id interleaves as pack·nParts + part —
    * globally unique for ANY per-part pack count (a fixed additive
    * offset would collide once one part exceeds it). */
  def packSequences(docs: DataFrame, budget: Long = PackBudget,
      nParts: Int = PackParts): DataFrame = {
    val t = docs.select(col("doc_id"),
      (col("doc_id") % nParts).as("part"),
      tokenCount(col("text")).as("n_tokens"))
    val w = Window.partitionBy(col("part")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("part"), col("n_tokens"),
        (floor((col("cum") - col("n_tokens")) / lit(budget.toDouble))
          .cast("long") * nParts + col("part")).as("pack_id"))
  }

  /** Per-pack occupancy report: documents and tokens per packed
    * sequence (the fill-rate histogram input). */
  def packReport(docs: DataFrame, budget: Long = PackBudget,
      nParts: Int = PackParts): DataFrame =
    packSequences(docs, budget, nParts)
      .groupBy(col("part"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"))

  /** Per-document token offsets inside each packed sequence (X234) —
    * the attention-boundary table that makes [[packSequences]]'s
    * output actually trainable: packed-sequence training needs the
    * block-diagonal attention mask (and the loss mask over boundary
    * tokens), and both derive from exactly these spans — `[tok_start,
    * tok_end)` per document within its pack, documents in the pack's
    * deterministic doc-id order, plus the first-in-pack flag the
    * resetting position-id column keys on. Emitting spans instead of
    * per-token rows keeps the table |docs|-sized, not |tokens|-sized
    * — the only shape that survives a 100 TB corpus.
    *
    * Scale: one window over (pack_id) ordered by doc_id — pack-sized
    * partitions by construction (the budget bounds them); everything
    * upstream is [[packSequences]]' partition-scoped machinery. */
  def packOffsets(docs: DataFrame, budget: Long = PackBudget,
      nParts: Int = PackParts): DataFrame = {
    val w = Window.partitionBy(col("pack_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packSequences(docs, budget, nParts)
      .withColumn("tok_end", sum(col("n_tokens")).over(w).cast("long"))
      .select(col("doc_id"), col("pack_id"), col("n_tokens"),
        (col("tok_end") - col("n_tokens")).cast("long").as("tok_start"),
        col("tok_end"),
        when(col("tok_end") === col("n_tokens"), 1L).otherwise(0L)
          .as("is_first_in_pack"))
  }

  // ---- deterministic pre-training shuffle ----

  val ShuffleSeed = "graft-r3"
  val NumShards = 8

  /** Deterministic global shuffle for training order: pseudo-random key
    * md5(seed ‖ id), documents assigned to an output shard by the key
    * and ranked within the shard — exactly how a cluster writes
    * shuffled training shards (one writer per shard, readers
    * interleave shards). No global sort exists anywhere: the rank
    * window is partitioned by shard, so the work parallelizes across
    * shards and the shape is seed-reproducible on any cluster size. */
  def shuffleShards(docs: DataFrame, seed: String = ShuffleSeed,
      nShards: Int = NumShards): DataFrame = {
    val key = md5(concat(lit(seed), lit("-"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    docs.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard",
        conv(substring(col("shuffle_key"), 1, 8), 16, 10)
          .cast("long") % nShards)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  // ---- end-to-end curation composite ----

  val MinQuality = 0.5

  val ChunkSize = 16
  val ChunkOverlap = 4

  /** Fixed-size overlapping token chunks — the RAG/episode chunker
    * (context windows with `overlap` tokens of continuity across
    * boundaries). Chunk starts step by `size - overlap`; the final
    * chunk may be short. Pure per-row array work (one Generate over a
    * start-position sequence + codegen'd `slice`) — embarrassingly
    * parallel, and at cluster scale SHUFFLE-FREE: the only exchange
    * [[graft.core.Spread]] can introduce is the local single-file
    * parallelism repair, which vanishes on any already-split source.
    * Emits the chunk fingerprint rather than the text (the md5 keeps
    * the oracle hash exact; a real pipeline would carry the slice). */
  def chunkWithOverlap(docs: DataFrame, size: Int = ChunkSize,
      overlap: Int = ChunkOverlap): DataFrame = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    graft.core.Spread(docs)
      .select(col("doc_id"),
        graft.text.CorpusStats.tokenArray(col("text")).as("w"))
      .filter(size_(col("w")) > 0)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size_(col("w")) - 1, lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        slice(col("w"), col("start") + 1, lit(size)).as("c"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size_(col("c")).cast("long").as("n_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_fp"))
  }

  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  val NumTiles = 10

  /** Exact global quantile bucketing WITHOUT a global sort — the
    * equi-depth binning a 100 TB length/quality distribution needs
    * (curriculum bucketing, per-decile sampling rates). `ntile()` over
    * the full corpus would plan a single-partition window; instead the
    * global rank decomposes as
    *   rank(doc) = |rows with smaller value| + rank within equal-value
    * so the only single-partition structure is the cumulative offset
    * over the VALUE-DISTRIBUTION aggregate (one row per distinct
    * n_chars — bounded by the value domain, not the corpus), which is
    * then broadcast back. The intra-value window hash-partitions on the
    * value key. Tile = ((rank-1)·k) div N + 1: same integer arithmetic
    * in both engines, no NTILE remainder-placement ambiguity. */
  def lengthDeciles(docs: DataFrame, k: Int = NumTiles): DataFrame = {
    val base = graft.core.CacheBay.register(
      docs.select(col("doc_id"), col("n_chars")))
    val off = base.groupBy(col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n_chars"), col("off"))
    val nd = base.agg(count(lit(1)).as("n_total"))
    base.join(broadcast(off), Seq("n_chars"))
      .withColumn("global_rank",
        (col("off") + row_number().over(
          Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))))
          .cast("long"))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("n_chars"), col("global_rank"),
        (expr(s"((global_rank - 1) * $k) div n_total") + 1L).as("tile"))
  }

  /** Curriculum phases (easy → hard) for [[curriculumOrder]]. */
  val CurriculumPhases = 3

  /** Deterministic curriculum training order (X236) — the artifact a
    * curriculum run actually consumes: documents split into quality
    * PHASES (phase 1 = cleanest — the easy-first schedule), and
    * within each phase the seed-reproducible shard shuffle (X-shuffle
    * device) so readers stream phase by phase, interleaving shards.
    * Phases are DISTRIBUTION-relative (exact global rank terciles via
    * the [[lengthDeciles]] value-decomposition — never a fixed score
    * band that silently empties on a clean corpus); a tie group
    * straddling a tercile boundary splits deterministically by
    * doc_id, so phase quality ranges can touch but never invert.
    *
    * Scale: the value-decomposition bounds the unpartitioned work to
    * the quality-score VALUE domain (≤ 10⁶+1 rows, data-independent);
    * row-level windows partition on (quality) then (phase, shard);
    * no global sort anywhere. */
  def curriculumOrder(docs: DataFrame, phases: Int = CurriculumPhases,
      seed: String = ShuffleSeed, nShards: Int = NumShards,
      scored: Option[DataFrame] = None): DataFrame = {
    val base = scored.map(_.select(col("doc_id"), col("quality_e6")))
      .getOrElse(graft.core.CacheBay.register(
        qualityScored(docs).select(col("doc_id"), col("quality_e6"))))
    val off = base.groupBy(col("quality_e6"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.orderBy(desc("quality_e6"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("quality_e6"), col("off"))
    val nd = base.agg(count(lit(1)).as("n_total"))
    val phased = base.join(broadcast(off), Seq("quality_e6"))
      .withColumn("global_rank",
        (col("off") + row_number().over(
          Window.partitionBy(col("quality_e6")).orderBy(col("doc_id"))))
          .cast("long"))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("quality_e6"),
        (expr(s"((global_rank - 1) * $phases) div n_total") + 1L)
          .as("phase"))
    val key = md5(concat(lit(seed), lit("-"),
      col("doc_id").cast("string")))
    phased.withColumn("shuffle_key", key)
      .withColumn("shard",
        conv(substring(col("shuffle_key"), 1, 8), 16, 10)
          .cast("long") % nShards)
      .withColumn("rank_in_shard", row_number().over(
        Window.partitionBy(col("phase"), col("shard"))
          .orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("quality_e6"), col("phase"),
        col("shard"), col("rank_in_shard"))
  }

  /** Quality–length moment screen (X245) — the "is my quality score
    * just measuring length?" audit run before trusting a quality
    * filter: if quality correlates ~1 with token count, the filter is
    * a length filter wearing a costume, and its corpus will skew long
    * regardless of content. Emits the EXACT integer moments (n, Σx,
    * Σy, Σxy, Σx², Σy²) over (n_tokens, milli-quality) — the
    * X129/X146 discipline: the float correlation/slope step belongs
    * to the consumer, the engine's job is exact replayable sums.
    * Quality quantizes to milli-units (q3 = quality_e6 div 1000 ≤
    * 10³) so Σy² stays Long-exact past 10¹² documents.
    *
    * Σt² is the one sum that can wrap a Long on a very-long-document
    * corpus (Spark wraps silently where DuckDB's HUGEINT CAST would
    * error), so the dimStats guard applies here too: assert
    * n·max_t² ≤ 2⁶³ in double space — a sound upper bound on Σt²,
    * and (q3 ≤ 10³ ≤ max_t for any corpus where overflow is even
    * conceivable) on Σtq — and trip loudly instead of diverging.
    *
    * Scale: one linear pass over the integer quality frame, one 1-row
    * map-side-combinable aggregate. */
  def qualityLengthCorr(docs: DataFrame,
      scored: Option[DataFrame] = None): DataFrame =
    scored.getOrElse(qualityScored(docs))
      .select(col("n_tokens"),
        expr("quality_e6 div 1000").cast("long").as("q3"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        sum(col("q3")).cast("long").as("sum_q3"),
        sum(col("n_tokens") * col("q3")).cast("long").as("sum_tq"),
        sum(col("n_tokens") * col("n_tokens")).cast("long").as("sum_t2"),
        sum(col("q3") * col("q3")).cast("long").as("sum_q3_2"),
        max(col("n_tokens")).cast("long").as("__max_t"))
      .select(col("n"), col("sum_tokens"), col("sum_q3"),
        expr("coalesce(cast(assert_true(" +
          "cast(n as double) * cast(__max_t as double) * " +
          "cast(__max_t as double) <= 9.0e18, " +
          "'quality-length moments exceed the Long-exact range') " +
          "as bigint), 0) + sum_tq").cast("long").as("sum_tq"),
        col("sum_t2"), col("sum_q3_2"))

  val BalancedK = 50

  /** Exact-k-per-group deterministic sample: rank documents within
    * each language by their content-stable md5 hash (doc_id tiebreak)
    * and keep the first k — the "balanced eval subset" every
    * multilingual benchmark build needs: same k from every group,
    * stable across re-runs and machines, no rand() anywhere.
    *
    * Scale: one shuffle on the group key; the per-group sort is the
    * same cost class as any per-group top-k. For a dominant group,
    * compose a pre-filter `hashBucketE6 < ceil(4k/|group|·10⁶)` before
    * the window to bound the sorted set — the hash is uniform, so the
    * survivors still contain the true first k with near-certainty. */
  def balancedSample(docs: DataFrame, k: Int = BalancedK): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), col("lang"),
        hashBucketE6(col("doc_id")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  val LangTokenBudget = 2000L

  /** One-pass integer micro-unit quality scoring: (lang, source,
    * doc_id, quality_e6, n_tokens) — the exact-arithmetic mirror of
    * [[graft.text.TextAnalysis.qualityScore]] (`least(len·2000, 10⁶)`,
    * `(stop_hits·4·10⁶) div n_ws`, `10⁶ − (punct·5·10⁶) div
    * nonspace`; 4/3/3 weights), shared by [[tokenBudgetSelect]] and
    * [[perSourceCap]] so their rankings cannot drift. Integer, never a
    * rounded DOUBLE: last-ulp float ties would reorder greedy cuts
    * cross-engine. Map-only over the corpus (Spread adds no exchange
    * on an already-split source). */
  /** Session-cached [[qualityScored]] over the `documents` table at
    * `dir` — the pipeline family's shared derivation tier (the
    * [[graft.dedup.Dedup.sharedShingles]] pattern): six registry
    * queries (token budget, source cap, curriculum order, source
    * calibration, quality–length corr, domain quality) all start from
    * the same tokenize+regex quality scan, so a sweep pays the
    * per-doc regex passes ONCE instead of once per query — and at
    * 100 TB, one corpus scan feeds the whole family (guide §2.4).
    * Narrow output (lang, source, doc_id, quality_e6, n_tokens):
    * the heavy `text` column never enters the cache. */
  def sharedQualityScored(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.core.SessionCache.cached(spark, s"qscored:$dir")(
      qualityScored(graft.core.Tables(spark, dir, "documents")))

  private def qualityScored(docs: DataFrame): DataFrame = {
    val lowerToks = tokens(lower(col("text")))
    graft.core.Spread(docs)
      .select(col("lang"), col("source"), col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        size(filter(lowerToks,
          t => t.isin(LangMarkers.head._2.map(lit): _*)))
          .cast("long").as("stop_hits"),
        when(trim(col("text")) === "", lit(0L))
          .otherwise(size(lowerToks).cast("long")).as("n_ws"),
        length(regexp_replace(col("text"), "[^\\p{Punct}]", ""))
          .cast("long").as("n_punct"),
        length(regexp_replace(col("text"), WsClassPattern, ""))
          .cast("long").as("n_nonspace"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("len_s", least(col("len_chars") * 2000L, lit(1000000L)))
      .withColumn("stop_s", when(col("n_ws") === 0, lit(0L))
        .otherwise(least(expr("(stop_hits * 4000000) div n_ws"),
          lit(1000000L))))
      .withColumn("punct_s", when(col("n_nonspace") === 0, lit(1000000L))
        .otherwise(greatest(
          lit(1000000L) - expr("(n_punct * 5000000) div n_nonspace"),
          lit(0L))))
      .withColumn("quality_e6",
        expr("(len_s * 4 + stop_s * 3 + punct_s * 3) div 10"))
      .select(col("lang"), col("source"), col("doc_id"),
        col("quality_e6"), col("n_tokens"))
  }

  val SourceCap = 10

  /** Per-source (per-domain) document cap — the C4/RefinedWeb-family
    * curation rule that stops any single domain from dominating the
    * corpus: keep at most `cap` documents per `source`, best quality
    * first (doc_id tiebreak), and drop the rest. Emits the kept rows
    * with their within-source rank.
    *
    * Scale shape (the [[tokenBudgetSelect]] decomposition, NOT a
    * per-source `row_number` over raw documents): a hot domain in a
    * web corpus can hold billions of rows, so ranking decomposes as
    * `rank = |better-quality docs in source| + rank within the
    * (source, quality) tie group`. The cumulative offset runs over the
    * (source, quality) VALUE-DISTRIBUTION aggregate — bounded by the
    * score domain per source, not the domain's row count — and the
    * only row-level window partitions on the compound (source,
    * quality) key, so even a pathological single-domain corpus spreads
    * across the quality buckets. The offset joins back ON THE COMPOUND
    * KEY (sources are unbounded at web scale — never broadcast). */
  def perSourceCap(docs: DataFrame, cap: Int = SourceCap,
      scoredIn: Option[DataFrame] = None): DataFrame = {
    val scored = scoredIn
      .map(_.select(col("source"), col("doc_id"), col("quality_e6")))
      .getOrElse(graft.core.CacheBay.register(
        qualityScored(docs)
          .select(col("source"), col("doc_id"), col("quality_e6"))))
    val off = scored.groupBy(col("source"), col("quality_e6"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.partitionBy(col("source"))
          .orderBy(col("quality_e6").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("quality_e6"), col("off"))
    scored.join(off, Seq("source", "quality_e6"))
      .withColumn("rk", (col("off") + row_number().over(
        Window.partitionBy(col("source"), col("quality_e6"))
          .orderBy(col("doc_id")))).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("source"), col("doc_id"), col("quality_e6"), col("rk"))
  }

  /** Token-budget corpus selection — the mixing step that turns "all
    * surviving documents" into "the N-token training corpus": per
    * language, documents are ranked by quality (best first, doc_id
    * tiebreak) and kept while the cumulative token count stays within
    * the budget. Strict PREFIX semantics — a document that would
    * overflow the budget is skipped and nothing after it is
    * back-filled — so the kept set is a deterministic function of the
    * ranking, not a knapsack heuristic.
    *
    * Quality is an integer-ppm mirror of
    * [[graft.text.TextAnalysis.qualityScore]]: ranking on a rounded
    * DOUBLE would be fragile cross-engine (last-ulp ties reorder the
    * greedy cut), so every component is computed in exact integer
    * arithmetic — `least(len·2000, 10⁶)`, `(stop_hits·4·10⁶) div
    * n_tokens`, `10⁶ − (punct·5·10⁶) div nonspace` — and the engines
    * agree bit-for-bit.
    *
    * Scale shape (same decomposition as [[lengthDeciles]]): the
    * per-language cumulative sum is NOT a per-language global-sort
    * window over documents — it decomposes over the (lang, quality)
    * VALUE-DISTRIBUTION aggregate (bounded by the score domain, not
    * the corpus), broadcast back, plus an intra-(lang, quality) window
    * hash-partitioned on the value key. */
  def tokenBudgetSelect(docs: DataFrame,
      budgetPerLang: Long = LangTokenBudget,
      scored: Option[DataFrame] = None): DataFrame = {
    val base = scored
      .map(_.select(col("lang"), col("doc_id"), col("quality_e6"),
        col("n_tokens")))
      .getOrElse(graft.core.CacheBay.register(
        qualityScored(docs)
          .select(col("lang"), col("doc_id"), col("quality_e6"),
            col("n_tokens"))))
    val off = base.groupBy(col("lang"), col("quality_e6"))
      .agg(sum(col("n_tokens")).as("s"))
      .withColumn("off", coalesce(
        sum(col("s")).over(Window.partitionBy(col("lang"))
          .orderBy(col("quality_e6").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("quality_e6"), col("off"))
    base.join(broadcast(off), Seq("lang", "quality_e6"))
      .withColumn("cum_tokens", (col("off") +
        sum(col("n_tokens")).over(
          Window.partitionBy(col("lang"), col("quality_e6"))
            .orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .cast("long"))
      .filter(col("cum_tokens") <= budgetPerLang)
      .select(col("lang"), col("doc_id"), col("quality_e6"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Per-source curation profile: doc count, exact-duplicate share
    * (ppm), and mean quality (integer micro-units) per `source` — the
    * domain-level report that drives source blocklists and mixing
    * weights in a web-scale corpus (per-domain curation is the first
    * cut every pretraining pipeline makes; per-doc scoring comes
    * after). One fingerprint+quality map pass, one hash aggregate:
    * linear, no driver state. Quality enters as
    * `floor(q·10⁶ + 0.5)` BEFORE the sum so the mean is exact integer
    * arithmetic in any accumulation order (the [[labelCentroids]]
    * spelling). */
  def sourceProfile(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        graft.text.TextAnalysis.fingerprintMd5(col("text")).as("fp"),
        floor(graft.text.TextAnalysis.qualityScore(col("text"))
          * 1000000.0 + 0.5).cast("long").as("q_e6"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("q_e6")).cast("long").as("sum_q"))
      .select(col("source"), col("n_docs"),
        expr("((n_docs - n_unique) * 1000000) div n_docs").as("dup_ppm"),
        expr("sum_q div n_docs").as("mean_quality_e6"))

  /** Arrival-batch count for the [[sourceQualityDrift]] mirror
    * (batch = `doc_id % DriftBatches`, the X78 arrival split). */
  val DriftBatches = 6
  /** CUSUM allowance divisor: k = baseline/20 — a sustained 5%-of-
    * baseline quality drop is the drift the monitor prices. */
  val DriftAllowanceDiv = 20L

  /** X319: per-source quality-drift CUSUM over arrival batches — the
    * monitor a 100 TB ingest runs continuously: the X79 source
    * profile gives each batch's per-source mean quality, and the X114
    * one-sided CUSUM accumulates sustained DOWNWARD drift against the
    * baseline (batch 0's mean — the stored profile a deployment
    * commits at onboarding): `dev_b = base − mean_b − k`,
    * `S_b = max(0, S_{b−1} + dev_b)`, alarm past `k·`
    * [[graft.analytics.Analytics.CusumAlarmMult]]. A slow template
    * rot or a scraper regression that never trips a per-batch
    * threshold accumulates here until it alarms (the Page-1954 point,
    * per source). Spelled in the order-free CLOSED FORM
    * (`S = C − min(0, min-prefix C)`, the X114 device) — two bounded
    * windows instead of a row-at-a-time loop; the sequential
    * recurrence lives in [[graft.streaming.StreamDrift]], whose
    * MemoryStream spec proves it lands on this mirror's state.
    *
    * Shape: one corpus map + a (source, batch) hash aggregate, a
    * baseline join at source grain, windows partitioned by source
    * over ≤ batches rows. Integer throughout: quality enters as
    * `floor(q·10⁶ + 0.5)` before the sum ([[sourceProfile]]'s exact-
    * mean spelling; witness bounds n before the e6 sum could wrap). */
  def sourceQualityDrift(docs: DataFrame, batches: Int = DriftBatches,
      allowDiv: Long = DriftAllowanceDiv,
      alarmMult: Long = graft.analytics.Analytics.CusumAlarmMult)
      : DataFrame = {
    val per = docs
      .select(col("source"), (col("doc_id") % batches).cast("long")
          .as("batch"),
        floor(qualityScore(col("text")) * 1000000.0 + 0.5).cast("long")
          .as("q_e6"))
      .groupBy(col("source"), col("batch"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("q_e6")).cast("long").as("sum_q"))
      .select(col("source"), col("batch"), col("n_docs"),
        expr("coalesce(cast(assert_true(" +
          "n_docs <= 9223372036854775807 div 1000000," +
          " 'drift batch mean exceeds the Long-exact e6 range: shard " +
          "the batch') as bigint), 0) + sum_q div n_docs")
          .as("mean_q_e6"))
    val baseline = per.filter(col("batch") === 0L)
      .select(col("source"), col("mean_q_e6").as("base_q_e6"),
        expr(s"mean_q_e6 div $allowDiv").as("k"))
    val w = Window.partitionBy(col("source")).orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.filter(col("batch") >= 1L).join(baseline, Seq("source"))
      .select(col("source"), col("batch"), col("n_docs"),
        col("mean_q_e6"), col("base_q_e6"), col("k"),
        (col("base_q_e6") - col("mean_q_e6") - col("k")).as("dev"))
      .withColumn("cum", sum(col("dev")).over(w).cast("long"))
      .select(col("source"), col("batch"), col("n_docs"),
        col("mean_q_e6"), col("base_q_e6"), col("k"), col("dev"),
        (col("cum") - least(lit(0L), min(col("cum")).over(w)))
          .cast("long").as("cusum"))
      .select(col("source"), col("batch"), col("n_docs"),
        col("mean_q_e6"), col("base_q_e6"), col("k"), col("dev"),
        col("cusum"),
        when(col("cusum") > col("k") * alarmMult, 1L).otherwise(0L)
          .as("is_alarm"))
  }

  /** Deterministic ratio mixing (curriculum interleave): source i (in
    * source-name order, 1-based) gets weight i; the j-th doc of a
    * source (1-based doc_id rank) is scheduled at integer key
    * `(j·10⁶) div weight`, and the global schedule position orders by
    * (key, source, doc_id) — any schedule prefix then holds the
    * sources in ≈weight proportion, with no RNG, reproducibly.
    *
    * Scale shape: the global rank is Spark's own distributed sort plus
    * per-partition offsets — `repartitionByRange` on the schedule order
    * (a range-partitioned shuffle, never a single-partition sort), one
    * count per range partition (a frame bounded by
    * `spark.sql.shuffle.partitions`, NOT by the data), a cumulative sum
    * over that tiny frame, and `below + row_number` within each range
    * partition. The partition-id join is a broadcast of ≤ #partitions
    * rows. The only frames ever single-partition-windowed or broadcast
    * are bounded by the source count or the partition count — the
    * doc-keyed frame itself is never broadcast and never globally
    * sorted on one task (the r5 verdict's X44-misapplication fix: a
    * rank-derived key has an unbounded domain, so per-key offsets were
    * O(n_docs); per-range-partition offsets are O(32)). The result is
    * partition-boundary-invariant: below + intra-partition rank equals
    * the global (key, source, doc_id) rank for ANY boundary choice, and
    * the persisted frame guarantees both consumers see the same
    * boundaries. */
  def mixInterleave(docs: DataFrame): DataFrame = {
    val weights = docs.select(col("source")).distinct()
      .withColumn("weight", row_number().over(
        Window.orderBy(col("source"))).cast("long"))
    val ranged = graft.core.CacheBay.register(
      docs.select(col("doc_id"), col("source"))
        .join(broadcast(weights), Seq("source"))
        .withColumn("src_rank", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id")))
          .cast("long"))
        .withColumn("key", expr("(src_rank * 1000000) div weight"))
        .repartitionByRange(col("key"), col("source"), col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(
        sum(col("c")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("below"))
    ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("mix_pos", (col("below") + row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("key"), col("source"), col("doc_id"))))
        .cast("long"))
      .select(col("doc_id"), col("source"), col("weight"),
        col("src_rank"), col("mix_pos"))
  }

  /** Width of one quality bucket in µunits (10 buckets across [0,1],
    * plus the exact-1.0 edge bucket). */
  val DriftBucketE6 = 100000L

  /** Quality-distribution drift between the hash splits — the
    * train/eval skew check run before shipping a split: a correct
    * doc_id-hash split should show every quality bucket at ≈ the same
    * share in train, valid, and test, and a drift here means the split
    * key correlates with content (leaky key, id assigned by source or
    * time). Emits the DENSE (bucket × split) grid — a bucket that is
    * populated in the corpus but EMPTY in one split is the starkest
    * drift and must not vanish from the report. All shares are integer
    * ppm (`n·10⁶ div total`), so the report hash-matches any engine.
    *
    * Scale shape: one map pass over the corpus into a
    * (split, bucket)-keyed count — tens of rows — and everything after
    * is arithmetic on that tiny frame (split/bucket margins, one
    * broadcast grand total). Linear, one aggregation shuffle. */
  def splitDrift(docs: DataFrame): DataFrame = {
    val b = docs.select(hashBucket(col("doc_id")).as("hb"),
        floor(graft.text.TextAnalysis.qualityScore(col("text"))
          * 1000000.0 + 0.5).cast("long").as("q_e6"))
      .select(when(col("hb") < TrainPct, lit("train"))
          .when(col("hb") < TrainPct + ValidPct, lit("valid"))
          .otherwise(lit("test")).as("split"),
        expr(s"q_e6 div $DriftBucketE6").cast("long").as("q_bucket"))
    val counts = graft.core.CacheBay.register(
      b.groupBy(col("split"), col("q_bucket"))
        .agg(count(lit(1)).cast("long").as("n")))
    val splitTotals = counts.groupBy(col("split"))
      .agg(sum(col("n")).cast("long").as("n_split"))
    val bucketTotals = counts.groupBy(col("q_bucket"))
      .agg(sum(col("n")).cast("long").as("n_bucket"))
    val grand = counts.agg(sum(col("n")).cast("long").as("n_all"))
    val grid = bucketTotals.select(col("q_bucket"), col("n_bucket"),
      explode(array(lit("train"), lit("valid"), lit("test"))).as("split"))
    grid.join(counts, Seq("split", "q_bucket"), "left")
      .join(splitTotals, Seq("split"), "left")
      .crossJoin(broadcast(grand))
      .select(col("split"), col("q_bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(expr("(n * 1000000) div n_split"), lit(0L))
          .as("share_ppm"),
        expr("(n_bucket * 1000000) div n_all").as("corpus_ppm"))
      .withColumn("drift_ppm", abs(col("share_ppm") - col("corpus_ppm")))
  }

  /** The full curation funnel a pre-training corpus goes through,
    * composed from this library's own operators: keep a document iff
    * it (1) is its exact-dup group's keeper, (2) scores at least
    * [[MinQuality]], (3) is not benchmark-contaminated (and is not
    * itself a benchmark doc), and (4) landed in the train split. The
    * output is the training corpus manifest with the audit columns a
    * curation run reports. Every stage is the already-proven operator;
    * this query is the proof they compose in one lazy plan.
    * `shingles`: the session tier, forwarded to [[decontaminate]]. */
  /** Session-cached [[curatedCorpus]] for the `documents` table at
    * `dir`: the funnel verdict is both a standalone registry query and
    * [[pretrainManifest]]'s first stage, so a sweep pays the
    * decontaminate⋈quality⋈split composition once (the
    * [[graft.dedup.Dedup.sharedShingles]] family-cache pattern).
    * Priced as `[cache:pipe.curated]` in Bench. */
  def sharedCuratedCorpus(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.core.SessionCache.cached(spark, s"curated:$dir")(
      curatedCorpus(graft.core.Tables(spark, dir, "documents"),
        shingles = Some(graft.dedup.Dedup.sharedShingles(spark, dir))))

  def curatedCorpus(docs: DataFrame,
      shingles: Option[DataFrame] = None): DataFrame = {
    val keepers = graft.dedup.Dedup.exactDedup(docs)
      .select(col("keep_id").as("doc_id"))
    val contam = decontaminate(docs, shingles = shingles)
      .select(col("doc_id"), col("contaminated"))
    val q = docs.select(col("doc_id"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("quality"))
    hashSplit(docs)
      .filter(col("split") === "train" && col("doc_id") % BenchMod =!= 0)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(q, Seq("doc_id"))
      .filter(col("quality") >= MinQuality)
      // docs absent from the contamination check (no shingles) carry no
      // contamination evidence and are kept
      .join(contam, Seq("doc_id"), "left")
      .filter(coalesce(col("contaminated"), lit(0L)) === 0L)
      .select(col("doc_id"), col("bucket"), col("quality"))
  }

  /** X301: end-to-end pretraining-shard MANIFEST (VERDICT r13 #5) —
    * the integration proof the pipeline family closes on: ONE lazy
    * plan composing the already-proven operators with no
    * materialization seam between stages, emitting the final
    * per-shard training manifest (shard, packed sequence, per-doc
    * token spans) a data loader would consume:
    *
    *  1. curate — the X29 funnel verdict (train split, non-benchmark,
    *     exact-dup keeper, quality ≥ [[MinQuality]], uncontaminated);
    *  2. paragraph dedup (X273) over the WHOLE corpus (dedup
    *     verdicts must see every copy), survivors keep their
    *     reassembled clean text; empty survivors drop;
    *  3. exact dedup AGAIN on the cleaned text — paragraph removal
    *     can only create new exact duplicates (two docs differing
    *     only in boilerplate converge), first doc_id keeps;
    *  4. token-budget select (X38) per language over the CLEANED
    *     text's quality ranking and token counts;
    *  5. deterministic shuffle (X40) into nShards training shards;
    *  6. concat-and-chunk packing (the X39 rule) within each shard
    *     in shuffle-rank order: seq = the packBudget-token chunk the
    *     doc STARTS in, spans relative to that chunk.
    *
    * Every stage is the standalone operator's exact code path (or its
    * arithmetic applied to the cleaned frame), so the DuckDB oracle
    * composes the SAME shared CTEs the standalone oracles use — the
    * composite and the parts cannot disagree about a document.
    *
    * Scale shape: no stage introduces a global sort or a corpus
    * broadcast — the funnel is keyed joins, paragraph dedup shuffles
    * on the paragraph hash, the budget select decomposes over the
    * (lang, quality) value distribution, the shuffle and the packing
    * windows partition on the bounded shard key. One lazy plan end
    * to end: Catalyst sees the whole funnel and prunes every unused
    * column back into the scans. */
  def pretrainManifest(docs: DataFrame,
      budgetPerLang: Long = LangTokenBudget,
      packBudget: Long = PackBudget,
      nShards: Int = NumShards,
      shingles: Option[DataFrame] = None,
      curatedIn: Option[DataFrame] = None,
      paraDedupIn: Option[DataFrame] = None): DataFrame = {
    // `curatedIn`/`paraDedupIn`: the session tiers ([[sharedCuratedCorpus]]
    // / [[graft.dedup.Dedup.sharedParagraphDedup]]) — the two funnel
    // stages that are ALSO standalone registry queries, so a sweep
    // materializes each once instead of once per consumer per pass
    val curated = curatedIn.getOrElse(curatedCorpus(docs, shingles))
      .select(col("doc_id"))
    val cleaned = graft.core.CacheBay.register(
      paraDedupIn.getOrElse(graft.dedup.Dedup.paragraphDedup(docs))
        .join(curated, Seq("doc_id"), "left_semi")
        .join(docs.select(col("doc_id"), col("lang"), col("source")),
          Seq("doc_id"))
        .filter(col("clean_text") =!= "")
        .select(col("doc_id"), col("lang"), col("source"),
          col("clean_text").as("text")))
    val keep2 = graft.dedup.Dedup.exactDedup(cleaned)
      .select(col("keep_id").as("doc_id"))
    // `selected` is consumed TWICE below (shuffleShards builds the
    // shard/rank assignment from it, then the packing join reads it
    // again) — without a cache boundary the whole budget-select
    // subtree (join + two windows over the corpus) re-evaluates per
    // consumer (guide §2.4: two ops keyed off one derivation share
    // one materialization; measured r16: ~1 s of the 4.2 s query)
    val selected = graft.core.CacheBay.register(tokenBudgetSelect(
      cleaned.join(keep2, Seq("doc_id"), "left_semi"), budgetPerLang)
      .select(col("doc_id"), col("n_tokens")))
    val shuffled = shuffleShards(selected, nShards = nShards)
      .select(col("doc_id"), col("shard"), col("rank"))
    val w = Window.partitionBy(col("shard")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    selected.join(shuffled, Seq("doc_id"))
      .withColumn("cum", sum(col("n_tokens")).over(w).cast("long"))
      .select(col("shard"),
        floor((col("cum") - col("n_tokens")) / lit(packBudget.toDouble))
          .cast("long").as("seq"),
        col("doc_id"), col("rank"), col("n_tokens"),
        (col("cum") - col("n_tokens") -
          floor((col("cum") - col("n_tokens")) / lit(packBudget.toDouble))
            .cast("long") * packBudget).cast("long").as("tok_start"),
        (col("cum") -
          floor((col("cum") - col("n_tokens")) / lit(packBudget.toDouble))
            .cast("long") * packBudget).cast("long").as("tok_end"))
  }

  /** X310: manifest shard WRITE (VERDICT r14 #7) — the side-effecting
    * last mile [[pretrainManifest]] plans for: materialize the
    * manifest as hive-partitioned training shards
    * (`partitionBy(shard)`) with the X57 single-pass `observe()`
    * counters, so the QC numbers (row count, token total, span
    * checksum) come out of the SAME job that wrote the shards — at
    * 100 TB the alternative is an entire extra read pass. The leading
    * `repartition(shard)` means each shard directory is written by
    * ONE task (no tasks × shards small-file explosion — the
    * [[graft.load.Sinks.writePartitionedSorted]] discipline), and the
    * within-task sort on (shard, rank) gives parquet row-group
    * min/max on the data-loader's read order. Returns the observed
    * metrics; [[ManifestWriteSpec]] asserts the written table
    * row-equals the lazy plan, the metrics match the written rows,
    * and the X82 compaction planner bins the written files.
    * Spec-only by nature (a write, not a query) — documented in
    * `SparkEntry.specOnly`. */
  def writeManifestShards(docs: DataFrame, path: String,
      budgetPerLang: Long = LangTokenBudget,
      packBudget: Long = PackBudget,
      nShards: Int = NumShards): Map[String, Any] = {
    val m = pretrainManifest(docs, budgetPerLang, packBudget, nShards)
    val obs = org.apache.spark.sql.Observation()
    // coalesced so an EMPTY manifest (everything curated away) reports
    // well-defined zeros / -1, not null metric cells
    m.observe(obs,
        count(lit(1)).cast("long").as("n_rows"),
        coalesce(sum(col("n_tokens")), lit(0L)).cast("long")
          .as("n_tokens"),
        coalesce(sum(col("tok_end") - col("tok_start")), lit(0L))
          .cast("long").as("span_tokens"),
        coalesce(max(col("shard")), lit(-1L)).cast("long")
          .as("max_shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("rank"))
      .write.partitionBy("shard")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    obs.get
  }

  /** Temporal fold period (days) and embargo gap (days) for
    * [[embargoSplit]] — weekly folds with a one-day purge fit the
    * fixture's 30-day event window (5 folds); production feeds tune
    * both together. */
  val EmbargoFoldDays = 7L
  val EmbargoGapDays = 1L

  /** Purged temporal split with embargo — the time-series analogue of
    * [[hashSplit]]: folds are contiguous `foldDays` blocks of the
    * timeline, and rows within `gapDays` of a fold boundary are
    * EMBARGOED (assigned to no fold) so that nothing trained on fold k
    * has seen data adjacent in time to fold k+1's evaluation window —
    * the leakage-purging device of time-ordered cross-validation
    * (standard practice for financial/temporal model evaluation, e.g.
    * de Prado's purged k-fold). A model pipeline that splits temporal
    * data with a hash split leaks auto-correlated neighbors across the
    * boundary; this operator is the fix, and its per-fold report is
    * the audit.
    *
    * Pure integer day arithmetic (epoch micros div 86,400,000,000 —
    * `unix_micros` here, `epoch_us` in the oracle), so both engines
    * agree bit-for-bit. One map + one map-side-combinable aggregate at
    * fold grain; nothing global, embargo never reads neighboring rows
    * (membership is a closed-form predicate on the day offset). */
  def embargoSplit(events: DataFrame, foldDays: Long = EmbargoFoldDays,
      gapDays: Long = EmbargoGapDays): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val off = col("epoch_day") % foldDays
    events
      .select(day.as("epoch_day"))
      .select(col("epoch_day"), expr(s"epoch_day div $foldDays").as("fold"),
        // embargoed: within gapDays of either edge of the fold block
        when(off < gapDays || off >= foldDays - gapDays, 1L)
          .otherwise(0L).as("embargoed"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("embargoed")).cast("long").as("n_embargoed"),
        min(when(col("embargoed") === 0L, col("epoch_day")))
          .cast("long").as("kept_min_day"),
        max(when(col("embargoed") === 0L, col("epoch_day")))
          .cast("long").as("kept_max_day"))
      .select(col("fold"), col("n_rows"), col("n_embargoed"),
        (col("n_rows") - col("n_embargoed")).as("n_kept"),
        col("kept_min_day"), col("kept_max_day"))
  }

  /** K-anonymity audit (X171) — the privacy gate beside the PII
    * scrub ([[piiRedact]] removes direct identifiers; this measures
    * QUASI-identifier risk): rows whose quasi-identifier combination
    * is shared by fewer than k rows are re-identifiable by linkage
    * (Sweeney 2002), and a training corpus carrying them leaks. The
    * audit reports the equivalence-class landscape in three bands —
    * unique (class size 1), below_k, at_or_above_k — with class and
    * row counts and each band's row share in exact ppm.
    *
    * Scale: ONE aggregate to class grain (the only shuffle, on the
    * quasi-identifier key), then banding and the ppm normalization
    * run on the 3-row band frame (its empty-partition window is
    * 3-row-bounded by construction). Release decisions
    * (suppress/generalize) are the caller's policy — this is the
    * measurement. */
  /** l-diversity audit (X264, Machanavajjhala et al. 2007) — the
    * HOMOGENEITY-attack companion to [[kAnonymityAudit]]: a class can
    * be safely large (k-anonymous) yet carry ONE sensitive value, so
    * membership alone discloses it. Per quasi-identifier class the
    * exact distinct-sensitive-value count l, banded at the shared
    * [[LDiversityL]]: `1_homogeneous` (l = 1, disclosure),
    * `2_below_l`, `3_at_or_above_l`; per band the class/row counts and
    * integer row share. Same shape and scale story as the k-audit:
    * one class-grain aggregate (the exact per-class distinct is
    * bounded by the class size), a ≤3-row banding rollup, one 1-row
    * total broadcast. */
  val LDiversityL = 3

  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: String, l: Int = LDiversityL): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("sz"),
        countDistinct(col(sensitive)).cast("long").as("l_div"))
    classes
      .select(when(col("l_div") === 1L, "1_homogeneous")
        .when(col("l_div") < l, "2_below_l")
        .otherwise("3_at_or_above_l").as("band"), col("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("sz")).cast("long").as("n_rows"))
      .withColumn("total_rows", sum(col("n_rows"))
        .over(Window.partitionBy()).cast("long"))
      .withColumn("row_share_ppm",
        expr("(n_rows * 1000000) div total_rows"))
  }

  /** t bar (ppm of total-variation distance) for [[tClosenessAudit]]:
    * the classic t = 0.3. */
  val TClosenessPpm = 300000L

  /** X305: t-closeness audit — the third leg of the privacy trio
    * (k-anonymity bounds class SIZE, l-diversity bounds sensitive
    * CARDINALITY, t-closeness bounds the sensitive DISTRIBUTION: a
    * class whose sensitive values are diverse but heavily skewed vs
    * the corpus still leaks — the skewness attack l-diversity
    * misses). Per quasi-identifier class, the total-variation
    * distance between the class's sensitive distribution and the
    * GLOBAL one, as exact integer ppm:
    * `tv = ½ Σ_v |c_v/n − g_v/N|` cross-multiplies to
    * `Σ_v |c_v·N − n·g_v| · 10⁶ div (2·n·N)` — every operand a count
    * (row-bounded, never a wrappable weighted sum), the products in
    * decimal(38,0) with a double-space headroom witness, the quotient
    * emerging ≤ 10⁶ into a Long.
    *
    * Scale: one (QI, sensitive) cell aggregate, two rollups of it,
    * and a class × sensitive-domain grid (the sensitive domain is
    * attribute-sized, broadcast) — absent cells enter as zeros, which
    * the |·| needs. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: String, tPpm: Long = TClosenessPpm): DataFrame = {
    val q = quasiCols.map(col)
    val cells = graft.core.CacheBay.register(
      df.groupBy(q :+ col(sensitive): _*)
        .agg(count(lit(1)).cast("long").as("c")))
    val classes = cells.groupBy(q: _*)
      .agg(sum(col("c")).cast("long").as("n"))
    val global = cells.groupBy(col(sensitive))
      .agg(sum(col("c")).cast("long").as("g"))
    val total = global.agg(sum(col("g")).cast("long").as("nn"))
    classes.crossJoin(broadcast(global))
      .join(cells, quasiCols :+ sensitive, "left")
      .select((q :+ col("n") :+ col("g") :+
        coalesce(col("c"), lit(0L)).as("c")): _*)
      .crossJoin(broadcast(total))
      .groupBy(q :+ col("n") :+ col("nn"): _*)
      .agg(sum(expr("abs(cast(c as decimal(38,0)) * nn - " +
        "cast(n as decimal(38,0)) * g)")).as("sd"))
      .select((q :+ col("n").as("n_rows") :+
        expr("coalesce(cast(assert_true(" +
          "cast(n as double) * cast(nn as double) * 2000000.0 " +
          "<= 0.9e38, " +
          "'t-closeness decimal(38) headroom exceeded: slice finer')" +
          " as bigint), 0) + " +
          "cast(sd * 1000000 div " +
          "(2 * cast(n as decimal(38,0)) * nn) as bigint)")
          .as("tv_ppm")): _*)
      .withColumn("is_far",
        when(col("tv_ppm") > tPpm, 1L).otherwise(0L))
  }

  // ---- web-curation URL/domain layer ----

  /** Per-registered-domain token-share cap (ppm): a domain carrying
    * more than this share of corpus tokens is flagged — the
    * RefinedWeb/C4-style per-domain cap every CC-scale pipeline
    * applies so one boilerplate-heavy site cannot dominate the mix. */
  val DomainCapPpm = 300000L

  /** Deterministic synthetic URL from (source, doc_id) — the same
    * device as [[withSyntheticPii]]: the corpus carries no URLs, so
    * one is derived with the identical expression in both engines,
    * deliberately messy so every canonicalization rule demonstrably
    * fires: scheme/host case noise, an optional `WWW.` prefix, an
    * optional default `:443` port, a trailing slash on odd ids, query
    * params in id-dependent order, and an occasional `#top` fragment.
    * Everything identity-bearing depends on `doc_id div 2`, so id
    * pairs sharing a source collapse to ONE canonical URL — the
    * planted exact-URL duplicates. Pure map work. */
  def withSyntheticUrl(docs: DataFrame): DataFrame = {
    val g = expr("doc_id div 2")
    docs.select(col("doc_id"), col("source"), col("text"),
      concat(
        when(col("doc_id") % 2 === 0, "https").otherwise("HTTPS"),
        lit("://"),
        when(col("doc_id") % 3 === 0, "WWW.").otherwise(""),
        when(col("doc_id") % 4 === 0, upper(col("source")))
          .otherwise(col("source")),
        (g % 7).cast("string"), lit(".com"),
        when(col("doc_id") % 5 === 0, ":443").otherwise(""),
        lit("/doc/"), g.cast("string"),
        when(col("doc_id") % 2 === 1, "/").otherwise(""),
        when(col("doc_id") % 2 === 0,
          concat(lit("?a="), (g % 10).cast("string"),
            lit("&b="), (g % 3).cast("string")))
          .otherwise(concat(lit("?b="), (g % 3).cast("string"),
            lit("&a="), (g % 10).cast("string"))),
        when(col("doc_id") % 3 === 1, "&utm_source=feed").otherwise(""),
        when(col("doc_id") % 6 === 0, "#top").otherwise("")
      ).as("url_raw"))
  }

  /** URL canonicalization — the standard normal form before exact URL
    * dedup (RFC 3986 syntax-based normalization plus the usual crawl
    * conventions): lowercase scheme and host, strip the scheme's
    * default port (`:80`/`:443`), strip a leading `www.`, drop the
    * fragment, collapse trailing slashes on the path (root stays
    * `/`), drop `utm_*` tracking parameters (the crawl-dedup rule —
    * tracking params multiply one page into dozens of "URLs"; a query
    * left all-tracking loses its `?` entirely), and sort the
    * surviving query parameters so param order is identityless.
    * Pure string built-ins (regexp_extract/replace + array_sort +
    * a HOF filter over the tiny param array) with
    * character-identical patterns in the DuckDB oracle — no UDF, no
    * URL library. */
  def canonicalUrl(url: Column): Column = {
    val sch = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z]+://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]+)", 1))
    val noPort = when(sch === "https",
        regexp_replace(hostport, ":443$", ""))
      .when(sch === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val pathqf = regexp_replace(rest, "^[^/?#]+", "")
    val trimmed = regexp_replace(
      regexp_extract(pathqf, "^([^?#]*)", 1), "/+$", "")
    val path = when(trimmed === "", "/").otherwise(trimmed)
    val q = regexp_extract(pathqf, "\\?([^#]*)", 1)
    val params = array_join(array_sort(
      filter(split(q, "&"), p => !p.startsWith("utm_"))), "&")
    val qs = when(q === "" || params === "", "")
      .otherwise(concat(lit("?"), params))
    concat(sch, lit("://"), host, path, qs)
  }

  /** Registered domain of a canonical URL — the last two host labels
    * (the per-site aggregation grain CC pipelines cap and audit by;
    * a public-suffix list would refine multi-label TLDs, but the
    * synthetic hosts are all `name.com`). */
  def registeredDomain(canonUrl: Column): Column =
    regexp_extract(
      regexp_extract(canonUrl, "^[a-z]+://([^/?#]+)", 1),
      "([^.]+\\.[^.]+)$", 1)

  /** Canonicalize + exact URL dedup: each doc's raw and canonical
    * URL, its registered domain, and the exact-URL keeper verdict
    * (keeper = min doc_id per canonical URL — the crawl-dedup rule
    * "one document per URL"). One groupBy on the canonical URL (the
    * only shuffle besides the join back). */
  def urlCanonical(docs: DataFrame): DataFrame = {
    val u = withSyntheticUrl(docs)
      .select(col("doc_id"), col("url_raw"))
      .withColumn("url_canon", canonicalUrl(col("url_raw")))
      .withColumn("domain", registeredDomain(col("url_canon")))
    val keep = u.groupBy(col("url_canon"))
      .agg(min(col("doc_id")).as("keep_id"))
    u.join(keep, Seq("url_canon"))
      .select(col("doc_id"), col("url_raw"), col("url_canon"),
        col("domain"), col("keep_id"),
        when(col("doc_id") === col("keep_id"), 0L).otherwise(1L)
          .as("is_url_dup"))
  }

  /** Per-registered-domain doc/URL/token rollup with the cap verdict:
    * n_docs, distinct canonical URLs, total whitespace tokens, the
    * domain's exact-integer token share of the corpus (ppm), and
    * `over_cap` against [[DomainCapPpm]]. ONE domain-grain aggregate
    * (map-side combinable) + a 1-row grand-total broadcast — the
    * domain count is bounded by the web, not the corpus, so the
    * rollup frame stays tiny at any SF. Corpus total guarded under
    * the ×10⁶ Long-exact bar BEFORE the multiply. */
  def domainCap(docs: DataFrame, capPpm: Long = DomainCapPpm): DataFrame = {
    val d0 = withSyntheticUrl(docs).select(col("doc_id"),
        canonicalUrl(col("url_raw")).as("url_canon"),
        tokenCount(col("text")).as("n_tok"))
      .withColumn("domain", registeredDomain(col("url_canon")))
    val agg = d0.groupBy(col("domain"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        countDistinct(col("url_canon")).cast("long").as("n_urls"),
        sum(col("n_tok")).cast("long").as("tok_total"))
    val grand = agg.agg(sum(col("tok_total")).cast("long")
      .as("corpus_tok"))
    agg.crossJoin(broadcast(grand))
      .select(col("domain"), col("n_docs"), col("n_urls"),
        col("tok_total"),
        expr("(tok_total * 1000000 + coalesce(cast(assert_true(" +
          "coalesce(cast(corpus_tok as double), 0.0) <= 9.0e12, " +
          "'domain cap: corpus token total exceeds the ppm " +
          "Long-exact range') as bigint), 0)) div corpus_tok")
          .as("tok_share_ppm"))
      .withColumn("over_cap",
        when(col("tok_share_ppm") > capPpm, 1L).otherwise(0L))
  }

  /** Domain-quality verdict constants: a domain is flagged when its
    * integer mean quality sits under the floor with at least
    * `DomainQualityMinDocs` docs of support (a 2-doc domain is noise,
    * not a signal — the RefinedWeb §3 reading that quality filtering
    * is applied at DOMAIN granularity for systematic offenders). */
  val DomainQualityFloorE6 = 600000L
  val DomainQualityMinDocs = 3L

  /** Per-registered-domain quality profile + drop verdict (the
    * RefinedWeb domain-level filter beside [[domainCap]]'s volume
    * cap): docs, integer mean quality (`Σq div n`), share of
    * below-floor docs in exact ppm, and `flagged` when the mean is
    * under [[DomainQualityFloorE6]] with enough support. A
    * boilerplate-heavy or SEO'd site fails SYSTEMATICALLY — flagging
    * the domain catches the next crawl's pages too, which per-doc
    * screens cannot.
    *
    * Scale: one doc_id equi-join (map-side after the same scan) + ONE
    * domain-grain map-side-combinable aggregate; the sum is guarded by
    * an n·10⁶ pre-overflow witness. */
  def domainQualityProfile(docs: DataFrame,
      floorE6: Long = DomainQualityFloorE6,
      minDocs: Long = DomainQualityMinDocs,
      scored: Option[DataFrame] = None): DataFrame = {
    val dom = withSyntheticUrl(docs).select(col("doc_id"),
      registeredDomain(canonicalUrl(col("url_raw"))).as("domain"))
    val q = scored.getOrElse(qualityScored(docs))
      .select(col("doc_id"), col("quality_e6"))
    dom.join(q, Seq("doc_id"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("quality_e6")).cast("long").as("q_sum"),
        sum(when(col("quality_e6") < floorE6, 1L).otherwise(0L))
          .cast("long").as("n_low"))
      .select(col("domain"),
        // witness BEFORE the ppm multiply: n·10⁶ bounds q_sum (each
        // term ≤ 10⁶) and n_low·10⁶ alike
        expr("n_docs + coalesce(cast(assert_true(" +
          "cast(n_docs as double) * 1.0e6 <= 9.0e18, " +
          "'domain quality: doc count exceeds the ppm Long-exact " +
          "range') as bigint), 0)").cast("long").as("n_docs"),
        expr("q_sum div n_docs").as("mean_quality_e6"),
        expr("(n_low * 1000000) div n_docs").as("low_share_ppm"))
      .withColumn("flagged",
        when(col("n_docs") >= minDocs &&
          col("mean_quality_e6") < floorE6, 1L).otherwise(0L))
  }

  /** Per-domain boilerplate (template) rate (X278) — the jusText/
    * trafilatura question asked at SITE grain: what fraction of a
    * domain's paragraph mass is a template repeated across its own
    * pages (nav blocks, footers, subscribe boxes)? A paragraph is
    * template when it appears in ≥ 2 DISTINCT docs of the SAME
    * domain; the rate is exact ppm of paragraph occurrences. High
    * template share = extract-the-main-content before training, or
    * apply the X273 paragraph dedup. Uses the planted per-source
    * boilerplate ([[graft.dedup.Dedup.withBoilerplate]]) + the
    * corpus's natural exact-dup texts, so the verdict demonstrably
    * fires.
    *
    * Scale: one narrow Generate + two keyed aggregates — (domain,
    * paragraph-hash) grain then domain grain, both map-side
    * combinable; the doc_id join rides the same scan. */
  def domainBoilerplate(docs: DataFrame): DataFrame = {
    val dom = withSyntheticUrl(docs).select(col("doc_id"),
      registeredDomain(canonicalUrl(col("url_raw"))).as("domain"))
    val paras = graft.dedup.Dedup.withBoilerplate(docs)
      .select(col("doc_id"),
        explode(split(col("ptext"), "\n\n")).as("para"))
      .join(dom, Seq("doc_id"))
      .select(col("domain"), col("doc_id"), md5(col("para")).as("pkey"))
    paras.groupBy(col("domain"), col("pkey"))
      .agg(count(lit(1)).cast("long").as("n_occ"),
        countDistinct(col("doc_id")).cast("long").as("n_docs_with"))
      .groupBy(col("domain"))
      .agg(sum(col("n_occ")).cast("long").as("n_paras"),
        count(lit(1)).cast("long").as("n_distinct_paras"),
        sum(when(col("n_docs_with") >= 2, col("n_occ")).otherwise(0L))
          .cast("long").as("n_template"))
      .select(col("domain"), col("n_paras"), col("n_distinct_paras"),
        col("n_template"),
        expr("(n_template * 1000000) div n_paras").as("template_ppm"))
  }

  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Int = 10): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("sz"))
    val bands = classes
      .select(when(col("sz") === 1L, "1_unique")
        .when(col("sz") < k, "2_below_k")
        .otherwise("3_at_or_above_k").as("band"), col("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("sz")).cast("long").as("n_rows"))
    bands
      .withColumn("total_rows", sum(col("n_rows"))
        .over(Window.partitionBy()).cast("long"))
      .withColumn("row_share_ppm",
        expr("(n_rows * 1000000) div total_rows"))
  }

  /** Language → upsampling tier for [[prioritySample]]: weight = 2^tier
    * (rare languages upsampled). POWERS OF TWO are the exactness
    * contract — see the scaladoc. */
  val PriorityTiers: Seq[(String, Int)] =
    Seq("en" -> 0, "de" -> 1, "es" -> 1, "fr" -> 2, "zh" -> 2)

  /** Rows kept by [[prioritySample]]. */
  val PrioritySampleK = 100

  /** X291: weighted priority sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES) — the standard one-pass weighted
    * sample a curation pipeline draws for human review or probe
    * training sets: each row keys by `u^(1/w)` (u a uniform from the
    * row's own id) and the global top-k keys are the sample, which is
    * exactly a PPSWOR draw. Two determinism devices make the draw
    * replay identically in any IEEE-754 engine: the uniform is the
    * md5-bucket integer over 10⁶ (a deterministic dyadic-by-division
    * double), and weights are QUANTIZED TO POWERS OF TWO so
    * `u^(1/2^t)` is t repeated applications of the correctly-rounded
    * `sqrt` — no `pow`, whose rounding the IEEE standard does not fix.
    * Ties (u = 1 across tiers) break by doc_id.
    *
    * Scale: map-only key computation + ONE TakeOrdered top-k (no
    * global sort materialization), then a lang-grain rollup of the
    * k-row sample joined against the lang totals — broadcastable both
    * sides. */
  def prioritySample(docs: DataFrame,
      k: Int = PrioritySampleK): DataFrame = {
    val tierCase = PriorityTiers
      .map { case (l, t) => s"WHEN lang = '$l' THEN $t" }
      .mkString("CASE ", " ", " ELSE 0 END")
    val keyed = docs.select(col("doc_id"), col("lang"),
        (hashBucketE6(col("doc_id")) + 1).cast("double")
          ./(lit(1000000.0)).as("u"),
        expr(tierCase).cast("int").as("tier"))
      // u^(1/2^t): t-fold sqrt — NEVER pow (rounding unspecified)
      .withColumn("key", expr(
        (0 until PriorityTiers.map(_._2).max).foldLeft("u") {
          case (acc, i) => s"if(tier > $i, sqrt($acc), $acc)"
        }))
    val sampled = keyed
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_sampled"))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        expr(tierCase).cast("long").as("tier"))
  }

  /** X283: right-to-be-forgotten cascade audit — the GDPR/CCPA erasure
    * PREFLIGHT every data platform runs before executing a delete
    * sweep: given a deterministic forget-set of users (here the
    * [[hashBucket]] device mod [[ForgetMod]], the way X57 injects PII
    * — a real deployment passes the DSR id list), report per table how
    * many rows and distinct keys the erasure touches, including the
    * REFERENTIAL cascade (lineitem holds no user key — its affected
    * rows follow through the orders foreign key). The report is the
    * audit artifact; the delete itself is the S14 predicate-delete
    * surface.
    *
    * Scale: events and orders legs are pure predicate aggregates (no
    * join — the forget flag is a hash of the row's own key); the
    * lineitem leg is ONE equi-join on orderkey against the forgotten
    * orders projection (broadcastable: the forget set is ~1/64 of
    * orders), then the same keyed aggregate. Three one-row frames
    * union — no cross joins, no collects. */
  val ForgetMod = 64

  def forgetAudit(events: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    def flag(id: Column): Column =
      (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
        .cast("long") % ForgetMod) === 0
    def leg(name: String, df: DataFrame, key: Column,
        affected: Column): DataFrame =
      df.select(key.as("k"), affected.as("hit"))
        .groupBy()
        .agg(count(lit(1)).cast("long").as("rows_total"),
          sum(when(col("hit"), 1L).otherwise(0L)).cast("long")
            .as("rows_affected"),
          countDistinct(when(col("hit"), col("k"))).cast("long")
            .as("keys_affected"))
        .select(lit(name).as("table_name"), col("rows_total"),
          col("rows_affected"), col("keys_affected"),
          expr("(rows_affected * 1000000) div greatest(rows_total, 1)")
            .cast("long").as("affected_ppm"))
    val forgottenOrders = orders
      .filter(flag(col("o_custkey")))
      .select(col("o_orderkey").as("fk_orderkey"),
        col("o_custkey").as("fk_custkey"))
    val liJoined = lineitem
      .join(forgottenOrders,
        lineitem("l_orderkey") === col("fk_orderkey"), "left")
    leg("events", events, col("user_id"), flag(col("user_id")))
      .unionByName(
        leg("orders", orders, col("o_custkey"), flag(col("o_custkey"))))
      .unionByName(
        leg("lineitem", liJoined, col("fk_custkey"),
          col("fk_custkey").isNotNull))
  }
}
