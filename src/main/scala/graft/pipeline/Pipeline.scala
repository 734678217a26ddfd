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

  /** Stratification report over the split: doc and char volumes per
    * (split, lang) — the sanity check run before shipping a split.
    * One partial-aggregated shuffle on a tiny key space. */
  def splitReport(docs: DataFrame): DataFrame =
    hashSplit(docs)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))

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
    * the per-doc count aggregate. Survives a 100× corpus unchanged. */
  def decontaminate(docs: DataFrame, benchMod: Int = BenchMod,
      minOverlap: Double = MinContamOverlap): DataFrame = {
    val ss = graft.core.CacheBay.register(
      graft.dedup.Dedup.shingleSets(docs))
    val ex = ss.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val bench = ex.filter(col("doc_id") % benchMod === 0)
      .select(col("sh")).distinct()
      .withColumn("__hit", lit(1))
    val agg = ex.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
    agg.select(col("doc_id"), col("n_sh"), col("n_hit"),
      round(col("n_hit").cast("double") / col("n_sh"), 6).as("overlap"),
      when(col("n_hit").cast("double") / col("n_sh") >= minOverlap, 1L)
        .otherwise(0L).as("contaminated"))
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
    * shape is unchanged. pack_id is globally unique via part offset. */
  def packSequences(docs: DataFrame, budget: Long = PackBudget,
      nParts: Int = PackParts): DataFrame = {
    val t = docs.select(col("doc_id"),
      (col("doc_id") % nParts).as("part"),
      tokenCount(col("text")).as("n_tokens"))
    val w = Window.partitionBy(col("part")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("part"), col("n_tokens"),
        (col("part") * lit(1000000L) +
          floor((col("cum") - col("n_tokens")) / lit(budget.toDouble))
            .cast("long")).as("pack_id"))
  }

  /** Per-pack occupancy report: documents and tokens per packed
    * sequence (the fill-rate histogram input). */
  def packReport(docs: DataFrame, budget: Long = PackBudget,
      nParts: Int = PackParts): DataFrame =
    packSequences(docs, budget, nParts)
      .groupBy(col("part"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"))
}
