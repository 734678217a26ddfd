package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching (record linkage): canonicalize noisy
  * name variants by edit distance — the master-data cleaning step
  * behind the reference's key-scrub + mapping-join load path
  * (`pipeline/lib.py` transform_* key cleaning feeding the NOT-MAPPED
  * lookup, J2/J7): instead of failing unmapped DIRTY variants, map
  * each name to a canonical representative among its close-edit
  * neighbors.
  *
  * Scale design — the two standard record-linkage bounds, both
  * structural:
  *  1. Pairwise work runs over the DISTINCT name domain, never the
  *     row table: a 100 TB fact with 10⁵ distinct names does |D|²-
  *     bounded comparison work, and rows get their label back through
  *     one equi-join on the name key (broadcastable when the domain
  *     is small — Catalyst/AQE decides from the aggregate's size).
  *  2. Comparison is confined to BLOCKS (first name token): only
  *     same-block pairs are ever generated — the classic blocking
  *     guard against |D|² blow-up — and a per-block size assert fails
  *     loudly (house rule: no silent caps) instead of silently
  *     degrading to quadratic work on a degenerate blocking key.
  *
  * Determinism: `levenshtein` is exact and identical in both engines;
  * the representative is the lexicographic MIN over the close-edit
  * neighborhood including the name itself — order-free, so the oracle
  * replays it with a plain GROUP BY. One-hop neighborhoods (not
  * transitive closure) keep the semantics local and replayable; the
  * LSH cluster family (X3) is the transitive-closure tool when chains
  * matter. */
object FuzzyMatch {

  /** Maximum edit distance for two names to be considered variants. */
  val MaxLev = 4

  /** Per-block distinct-name bound, assert-guarded: a blocking key
    * this degenerate needs a better key, not silent quadratic work. */
  val MaxBlock = 4096L

  /** Canonical-name map for `(key, name)` rows: `(key, nm, rep)` with
    * `rep` = lexicographic min over {nm} ∪ {same-block names within
    * [[MaxLev]] edits}. `nameCol` is lowercased for matching. */
  def canonicalMap(rows: DataFrame, keyCol: String, nameCol: String,
      maxLev: Int = MaxLev): DataFrame = {
    val n = rows.select(col(keyCol).as("key"),
      lower(col(nameCol)).as("nm"))
    // distinct-domain table — all pairwise work happens below here
    val dn = graft.core.CacheBay.register(
      n.groupBy(col("nm")).agg(count(lit(1)).as("n_rows"))
        .select(col("nm"),
          split(col("nm"), " ").getItem(0).as("blk")))
    // the guard lives in a FILTER (the asOf/pointInRange house
    // spelling), not a projected column — a pruned projection would
    // silently drop an assert-only column
    val guarded = dn.withColumn("blk_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("blk"))))
      .filter(expr(s"if (blk_n <= $MaxBlock, true, " +
        "isnull(raise_error('fuzzy blocking: block exceeds " +
        s"$MaxBlock distinct names ? use a more selective blocking " +
        "key')))"))
      .select(col("nm"), col("blk"))
    // |len(a)−len(b)| ≤ k is the classic edit-distance lower bound:
    // the cheap length gate runs BEFORE the O(len²) levenshtein, so
    // hopeless candidates never reach it — result-identical because
    // lev(a,b) ≥ |len(a)−len(b)| always
    val pairs = guarded
      .join(guarded.select(col("nm").as("cand"), col("blk")), Seq("blk"))
      .filter(col("nm") =!= col("cand") &&
        abs(length(col("nm")) - length(col("cand"))) <= maxLev &&
        levenshtein(col("nm"), col("cand")) <= maxLev)
    val rep = pairs.groupBy(col("nm"))
      .agg(least(col("nm"), min(col("cand"))).as("rep"))
    n.join(rep, Seq("nm"), "left")
      .select(col("key"), col("nm"),
        coalesce(col("rep"), col("nm")).as("rep"))
  }
}
