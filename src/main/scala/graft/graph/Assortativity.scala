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
  * symmetric and Σy ≡ Σx, Σy² ≡ Σx² — emitted once. Scale shape: the
  * edge-end moments FACTOR THROUGH the per-node degree: a node of
  * degree d contributes d rows as the x-side, so Σx = Σ_u d_u²,
  * Σx² = Σ_u d_u³, n = Σ_u d_u, and only Σxy needs the neighbor sum
  * S_u = Σ_{v∈N(u)} d_v (Σxy = Σ_u d_u·S_u) — ONE equi-join keyed by
  * the edge cache's partition key and two keyed aggregates replace the
  * r16 double-join over edge-grain rows (4 exchanges → the groupBy(u)
  * one). Long bounds asserted, not assumed: at ~10⁹ edge-ends with hub
  * degrees ~10³ the n·Σxy product approaches 2⁶³ and the operator must
  * fail loudly, not wrap. */
object Assortativity {

  /** One row: `(n_ends, s_x, s_xy, s_x2, num, den)` over canonical
    * `(a, b)` edges. `undIn`: an already-expanded undirected frame
    * (the registry passes [[Triangles.sharedUndirectedEdges]], cached
    * hash-partitioned on `v` — the degree aggregate and the
    * neighbor-sum join below then read it exchange-free). */
  def degreeMoments(edges: DataFrame,
      undIn: Option[DataFrame] = None): DataFrame = {
    val und = undIn.getOrElse(Triangles.undirected(edges))
    // degree keyed by the tier's partition side v (the edge set is
    // symmetric: counting rows per v IS the degree)
    val degv = und.groupBy(col("v"))
      .agg(count(lit(1)).cast("long").as("dv"))
    // per-node degree (count of u-rows) and neighbor-degree sum
    val nb = und.join(degv, Seq("v"))
      .groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("du"),
        sum(col("dv")).cast("long").as("s_nb"))
    nb
      .agg(sum(col("du")).cast("long").as("n_ends"),
        max(col("du")).cast("long").as("max_du"),
        sum(col("du") * col("du")).cast("long").as("s_x"),
        sum(col("s_nb") * col("du")).cast("long").as("s_xy"),
        sum(col("du") * col("du") * col("du")).cast("long").as("s_x2"))
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
