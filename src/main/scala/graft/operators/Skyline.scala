package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global 2-D skyline (Pareto frontier): the rows not DOMINATED under
  * (minimize price, maximize size) — no other row is both no-more-
  * expensive and no-smaller with at least one strict. The sort-based
  * sweep every single-node skyline uses (sort by price, keep rows
  * beating the running size max) is inherently sequential; the
  * distributed shape here gets the same answer from
  * [[PrefixScan]]:
  *
  *  1. collapse to price grain (`max(size)` per distinct price — one
  *     map-side-combinable aggregate);
  *  2. [[PrefixScan.prefixAgg]] computes, for every price, the max
  *     size among STRICTLY CHEAPER prices (the exclusive running max
  *     over the price order — two linear phases, no single-task
  *     window);
  *  3. join back: a row survives iff no strictly-cheaper price reaches
  *     its size (`m_excl < size`) and no same-price row strictly
  *     exceeds it (`size = msize`).
  *
  * Equal-(price, size) duplicates are all frontier members (domination
  * requires one strict inequality), and ties need no ordering
  * tie-break at all — the price-grain collapse makes the scan's order
  * keys unique by construction. Exact integer cents/sizes throughout.
  */
object Skyline {

  /** Frontier of `part` under (min p_retailprice, max p_size):
    * `(p_partkey, p_brand, price_cents, p_size)`. */
  def frontier(part: DataFrame): DataFrame = {
    val base = part.select(col("p_partkey"), col("p_brand"),
      floor(col("p_retailprice") * 100.0 + 0.5).cast("long")
        .as("price_cents"),
      col("p_size").cast("long").as("p_size"))
    val grain = base.groupBy(col("price_cents"))
      .agg(max(col("p_size")).cast("long").as("msize"))
    val scanned = PrefixScan.prefixAgg(grain, Seq("price_cents"),
      "msize", "max", "m_incl", "m_excl")
      .select(col("price_cents"), col("msize"), col("m_excl"))
    base.join(scanned, Seq("price_cents"))
      .filter(col("m_excl") < col("p_size") &&
        col("p_size") === col("msize"))
      .select(col("p_partkey"), col("p_brand"), col("price_cents"),
        col("p_size"))
  }
}
