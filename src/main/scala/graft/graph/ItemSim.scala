package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item co-purchase cosine neighborhoods (X199) — the classic
  * item-based collaborative-filtering primitive (Sarwar et al. 2001,
  * "people who bought a also bought b") over the binary order×item
  * matrix: `sim(a,b) = w_ab / sqrt(deg_a · deg_b)` where `w` is the
  * co-purchase support and `deg` the number of distinct orders
  * containing the item — cosine over binary basket columns. Ranking is
  * monotone in sim², so the engine emits EXACT integer ppm
  * (`sim2_ppm = w²·10⁶ div (deg_a·deg_b)`) and no square root ever
  * crosses an engine boundary; ties break on the partner id.
  *
  * Scale shape: candidates are exactly the support-weighted edge list
  * (X143's shared derivation — only pairs that co-occur at least once
  * exist; never an all-pairs item matrix), degrees are one
  * map-side-combinable aggregate at item grain, both degree
  * attachments are key equi-joins, and the top-k pick is one window
  * per item over its REAL neighbor list (bounded by the item's
  * co-purchase breadth, not the catalog). Long-exactness asserted:
  * `w ≤ 3.03·10⁶` (w²·10⁶ fits) and `deg ≤ 3.03·10⁹` (the degree
  * product fits) — the repo's standard sqrt-of-Long.Max guards.
  */
object ItemSim {

  /** Neighbors kept per item. */
  val TopK = 5

  /** `weighted`: canonical co-purchase edges `(a, b, w)` with a < b;
    * `op`: the distinct (order, item) incidence `(ok, p)` the edges
    * were derived from. Output: `(part, nbr, w, sim2_ppm, rank)`. */
  def itemNeighbors(weighted: DataFrame, op: DataFrame,
      k: Int = TopK): DataFrame = {
    val deg = op.groupBy(col("p")).agg(count(lit(1)).cast("long").as("deg"))
    val sym = weighted.select(col("a").as("part"), col("b").as("nbr"),
        col("w"))
      .unionByName(weighted.select(col("b").as("part"),
        col("a").as("nbr"), col("w")))
    val scored = sym
      .join(deg.select(col("p").as("part"), col("deg").as("da")),
        Seq("part"))
      .join(deg.select(col("p").as("nbr"), col("deg").as("db")),
        Seq("nbr"))
      .select(col("part"), col("nbr"), col("w"),
        expr("coalesce(cast(assert_true(" +
          "w <= 3037000 and da <= 3037000499 and db <= 3037000499, " +
          "'item-sim cross products exceed the Long-exact range: " +
          "move to decimal(38)') as bigint), 0) + " +
          "(w * w * 1000000) div (da * db)").cast("long")
          .as("sim2_ppm"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("part"))
          .orderBy(desc("sim2_ppm"), desc("w"), asc("nbr"))))
      .filter(col("rank") <= k)
      .select(col("part"), col("rank").cast("long").as("rank"),
        col("nbr"), col("w"), col("sim2_ppm"))
  }
}
