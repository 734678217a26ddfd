package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count–min sketch — the mergeable FREQUENCY estimator (Cormode &
  * Muthukrishnan 2005) beside [[KmvSketch]]'s cardinality one: d
  * independent hash rows × w counters, every input row increments one
  * counter per hash row, and an item's estimate is the MINIMUM of its
  * d counters. Estimates never undercount (each of the item's
  * counters holds its true count plus non-negative collision mass);
  * the expected overcount is bounded by N/w per row, and taking the
  * min across d rows drives the chance of a bad estimate down
  * exponentially. This is the structure a 100 TB pipeline keeps
  * per-partition and per-hour: d·w integers merge by cellwise ADD, so
  * sliding windows, shard unions, and cross-day rollups all combine
  * sketches instead of rescanning raw events.
  *
  * Determinism (the repo's oracle discipline): hash row j of item v
  * is the md5-hex8 integer of "j:v" mod w — no seeds, no engine
  * randomness — so counters, per-item minima, and the overcount
  * audit all hash-match a DuckDB replay bit for bit.
  *
  * Scale: the build is a bounded ×d explode into a (row, bucket)
  * hash aggregate — map-side combinable, d·w result rows total
  * regardless of input size. The estimate pass probes items against
  * the counter frame by a BROADCAST join (d·w rows ≪ any fact), one
  * aggregate per item for the min. No driver state, no collect. */
object CmsSketch {

  val Depth = 4
  val Width = 256

  private def hashExpr(j: String, v: String) =
    expr(s"CAST(conv(substring(md5(concat(CAST($j AS STRING), ':', " +
      s"CAST($v AS STRING))), 1, 8), 16, 10) AS BIGINT) % $Width")

  /** The d×w counter frame `( j, bucket, cnt )` for one item column —
    * the mergeable sketch itself. */
  def build(df: DataFrame, item: String, depth: Int = Depth): DataFrame =
    df.select(col(item).as("v"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), hashExpr("j", "v").as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Point estimates for every DISTINCT item in `df` against the
    * sketch built from the same frame, with the exact count and the
    * overcount carried for audit: `(item, exact_n, cms_est,
    * over_n)` — `cms_est ≥ exact_n` always (the CMS one-sided
    * guarantee; the audit makes the collision mass visible instead of
    * trusting the bound). */
  def estimateAll(df: DataFrame, item: String,
      depth: Int = Depth): DataFrame = {
    val counters = build(df, item, depth)
    val exact = df.groupBy(col(item).as("v"))
      .agg(count(lit(1)).cast("long").as("exact_n"))
    val probes = exact.select(col("v"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("v"), col("j"), hashExpr("j", "v").as("bucket"))
    val est = probes
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("v"))
      .agg(min(col("cnt")).cast("long").as("cms_est"))
    exact.join(est, Seq("v"))
      .select(col("v").as(item), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("over_n"))
  }
}
