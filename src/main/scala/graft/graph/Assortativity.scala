package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity MOMENTS of an undirected graph — do hubs link
  * to hubs (assortative, social-network shape) or to leaves
  * (disassortative, dependency/purchase shape)? Newman 2002's r is the
  * Pearson correlation of end-point degrees over the edge multiset;
  * this operator emits the EXACT INTEGER moments (n, Σx, Σxy, Σx²) and
  * the cross-multiplied numerator/denominator `n·Σxy − (Σx)²` /
  * `n·Σx² − (Σx)²`, the X129 mergeable-moments discipline: the ratio
  * involves a square root and a possibly-negative division (where
  * engine semantics part ways), so the exact moments are the contract
  * and the float r is one driver-side division away for the consumer.
  *
  * Each edge counts in BOTH orientations, so the (x, y) multiset is
  * symmetric and Σy ≡ Σx, Σy² ≡ Σx² — emitted once. Scale shape: one
  * degree aggregate, two equi-joins keyed by node (hub rows fan out by
  * their own degree — the same m-bounded expansion the triangle count
  * carries), one scalar aggregate. Long bounds asserted, not assumed:
  * at ~10⁹ edge-ends with hub degrees ~10³ the n·Σxy product
  * approaches 2⁶³ and the operator must fail loudly, not wrap. */
object Assortativity {

  /** One row: `(n_ends, s_x, s_xy, s_x2, num, den)` over canonical
    * `(a, b)` edges. */
  def degreeMoments(edges: DataFrame): DataFrame = {
    val und = Triangles.undirected(edges)
    val deg = und.groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("du"))
    und.join(deg, Seq("u"))
      .join(deg.select(col("u").as("v"), col("du").as("dv")), Seq("v"))
      .agg(count(lit(1)).cast("long").as("n_ends"),
        max(col("du")).cast("long").as("max_du"),
        sum(col("du")).cast("long").as("s_x"),
        sum(col("du") * col("dv")).cast("long").as("s_xy"),
        sum(col("du") * col("du")).cast("long").as("s_x2"))
      .select(col("n_ends"), col("s_x"), col("s_xy"), col("s_x2"),
        // Pre-overflow witness (VERDICT r13 #2), two-tier: the loose
        // double-space bound n_ends·max(deg) ≤ 9e18 proves Σdu never
        // wrapped; the original `s_x <= √Long.Max` then tests the
        // TRUSTWORTHY sum (a wrap — one hub with ~3·10⁹ edge-ends
        // squares past 2⁶³ — lands negative and would sail under the
        // one-sided `<=` without the witness), and via Cauchy-Schwarz
        // on non-negative degrees (Σa² ≤ (Σa)², Σab ≤ √(Σa²·Σb²))
        // also bounds Σdu² and Σdu·dv pre-wrap, making the n·Σ
        // product checks sound.
        expr("coalesce(cast(assert_true(" +
          "cast(n_ends as double) * cast(max_du as double) <= " +
          "9.0e18 and s_x <= 3037000499 and " +
          "n_ends <= 9223372036854775807 div greatest(s_xy, 1) and " +
          "n_ends <= 9223372036854775807 div greatest(s_x2, 1)," +
          " 'assortativity moments exceed the Long-exact range: move " +
          "to decimal(38)') as bigint), 0)" +
          " + (n_ends * s_xy - s_x * s_x)").as("num"),
        (col("n_ends") * col("s_x2") - col("s_x") * col("s_x"))
          .as("den"))
  }
}
