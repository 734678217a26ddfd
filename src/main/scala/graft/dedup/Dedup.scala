package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis._

/** Document deduplication for the training-data pipeline surface:
  * exact (hash group-by), MinHash+LSH, SimHash with banded Hamming
  * search, and n-gram Jaccard with a hot-shingle cap.
  *
  * Scale design:
  *  - Signature computation (MinHash / SimHash) is pure per-row map
  *    work inside whole-stage codegen — no UDFs, no shuffle.
  *  - Candidate generation NEVER does an O(n²) cross join: MinHash
  *    pairs come from an equi-join on (band, band-value) buckets and
  *    SimHash pairs from an equi-join on 4-bit signature segments
  *    (pigeonhole: Hamming ≤ 3 over 4 segments ⇒ ≥ 1 segment equal).
  *    Both shuffle on the bucket key only; AQE's skew-join split
  *    handles a hot bucket (a huge near-identical cluster).
  *  - n-gram Jaccard uses the standard inverted-index join with a
  *    document-frequency cap that drops ubiquitous shingles before the
  *    join — the classic guard against quadratic blow-up on hot terms.
  *
  * Hashing is MD5 (identical lowercase-hex output in Spark and DuckDB)
  * so every operator is oracle-checkable; a lexicographic min over
  * per-seed MD5 hex digests is a uniform MinHash permutation.
  */
object Dedup {

  val NumHashes = 16
  val Bands = 8 // rows-per-band = 2 → LSH S-curve threshold ≈ 0.35
  val SimhashBits = 16
  val SimhashSegments = 4 // 4-bit segments → guarantees recall at Hamming ≤ 3
  val MaxHamming = 3
  val ShingleN = 3
  val MaxShingleDf = 100 // hot-shingle cap for the Jaccard inverted index
  val MinJaccard = 0.5
  val MinEstJaccard = 0.5

  /** Distinct word-n-gram shingle sets; drops docs too short to shingle. */
  def shingleSets(docs: DataFrame, n: Int = ShingleN): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(wordShingles(col("text"), n)).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Exact dedup: group by normalized-text MD5; keeper = min doc_id. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash signature: sig[j] = min over shingles of md5("<j>|"+s). */
  def minhashSignature(docs: DataFrame,
      numHashes: Int = NumHashes): DataFrame =
    shingleSets(docs).select(col("doc_id"),
      transform(sequence(lit(0), lit(numHashes - 1)), j =>
        array_min(transform(col("shingles"), s =>
          md5(concat(j.cast("string"), lit("|"), s))))).as("sig"))

  /** MinHash signatures exploded into LSH band buckets. */
  private def banded(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    sig.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          array_join(slice(col("sig"), b * r + 1, lit(r)), "|")
            .as("bval")))).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
  }

  /** MinHash+LSH near-dup pairs: bucket-join candidates, then estimated
    * Jaccard = fraction of agreeing signature positions, thresholded. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = NumHashes,
      bands: Int = Bands, minEst: Double = MinEstJaccard): DataFrame = {
    val sig = minhashSignature(docs, numHashes)
    val bk = banded(sig, numHashes, bands)
    val a = bk.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
      col("band"), col("bval"))
    val b = bk.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
      col("band"), col("bval"))
    val agree = aggregate(
      zip_with(col("a_sig"), col("b_sig"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    a.join(b, Seq("band", "bval"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        round(agree / numHashes.toDouble, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  /** SimHash bit string: bit j is the sign of the shingle-vote sum,
    * where shingle s votes ±1 by the parity of hex digit j of md5(s). */
  def simhash(docs: DataFrame, bits: Int = SimhashBits): DataFrame =
    shingleSets(docs).select(col("doc_id"),
      array_join(transform(sequence(lit(1), lit(bits)), j =>
        when(aggregate(col("shingles"), lit(0L), (acc, s) =>
          acc + (ascii(md5(s).substr(j, lit(1))) % 2) * 2 - 1) > 0,
          lit("1")).otherwise(lit("0"))), "").as("simhash"))

  /** SimHash near-dup pairs at Hamming ≤ maxHamming via segment-equality
    * banding (no cross join): Hamming ≤ 3 over 4 segments guarantees at
    * least one identical 4-bit segment. */
  def simhashPairs(docs: DataFrame, bits: Int = SimhashBits,
      segments: Int = SimhashSegments,
      maxHamming: Int = MaxHamming): DataFrame = {
    val sh = simhash(docs, bits)
    val w = bits / segments
    val seg = sh.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(segments - 1)), s =>
        struct(s.as("seg"),
          col("simhash").substr(s * w + 1, lit(w)).as("sval")))).as("sk"))
      .select(col("doc_id"), col("simhash"),
        col("sk.seg").as("seg"), col("sk.sval").as("sval"))
    val a = seg.select(col("doc_id").as("a_id"),
      col("simhash").as("a_sh"), col("seg"), col("sval"))
    val b = seg.select(col("doc_id").as("b_id"),
      col("simhash").as("b_sh"), col("seg"), col("sval"))
    val hamming = aggregate(
      transform(sequence(lit(1), lit(bits)), i =>
        when(col("a_sh").substr(i, lit(1)) === col("b_sh").substr(i, lit(1)),
          lit(0L)).otherwise(lit(1L))),
      lit(0L), (acc, x) => acc + x)
    a.join(b, Seq("seg", "sval"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** True n-gram Jaccard near-dup pairs via the inverted-index join.
    * Shingles occurring in more than maxDf documents are dropped from
    * BOTH numerator and denominator (consistent set semantics) before
    * the join — the hot-term guard that keeps the join linear-ish. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = ShingleN,
      minJaccard: Double = MinJaccard, maxDf: Int = MaxShingleDf): DataFrame = {
    val ex = shingleSets(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val rare = ex.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("sh"))
    val exF = ex.join(rare, Seq("sh")) // inner = semi here (rare is distinct)
    val counts = exF.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = exF.select(col("doc_id").as("a_id"), col("sh"))
      .join(exF.select(col("doc_id").as("b_id"), col("sh")), Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnsRenamed(Map("doc_id" -> "a_id", "n_sh" -> "na")),
        Seq("a_id"))
      .join(counts.withColumnsRenamed(Map("doc_id" -> "b_id", "n_sh" -> "nb")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(col("shared") / (col("na") + col("nb") - col("shared")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
