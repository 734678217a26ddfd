package graft.maint

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planning operators — the layout work a 100 TB
  * parquet table needs continuously: small-file compaction (every
  * streaming/incremental sink fragments the table; scan cost is
  * per-file, so thousands of KB-files kill a table) and
  * space-filling-curve clustering (min/max data skipping only prunes
  * when each file's value ranges are tight on the filter columns).
  * Both are PLANNERS: they emit deterministic assignments a rewrite
  * job then executes — planning is a pure query, so it oracle-checks,
  * while the rewrite itself is the already-proven partitioned-write
  * path ([[graft.load.Sinks]]).
  */
object Maintenance {

  /** Target compaction chunk in bytes (fixture-sized; a real table
    * would target 128 MB–1 GB). */
  val TargetBytes = 4096L

  /** Small-file compaction plan: within each partition (`source`),
    * files concatenate in file-id order and split at `target`-byte
    * offsets — file f lands in bin `start_offset div target` where
    * `start_offset` is the cumulative size of its predecessors. Each
    * output chunk reads a CONTIGUOUS run of inputs, and the
    * concatenated stream through the end of any non-final bin k totals
    * ≥ (k+1)·target bytes — bins average ≥ target (an individual bin
    * can undershoot by at most one file, when a boundary-straddling
    * file is assigned to the bin where it starts). The assignment
    * depends only on (partition, order, sizes) — deterministic, so
    * the plan is idempotent across re-runs on the same snapshot.
    *
    * Scale shape: one partitioned running-sum window — a single hash
    * shuffle on the partition key; no global sort, no driver state.
    * The manifest is one row per FILE (a 100 TB table is ~10⁶ files,
    * not 10¹² rows), so even the window's per-partition sort is tiny. */
  def compactionPlan(manifest: DataFrame, partCol: String = "source",
      fileCol: String = "doc_id", sizeCol: String = "bytes",
      target: Long = TargetBytes): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
    manifest
      .withColumn("start_off",
        coalesce(sum(col(sizeCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("long"))
      .select(col(partCol), col(fileCol), col(sizeCol).cast("long"),
        expr(s"start_off div $target").cast("long").as("bin"))
  }

  /** Bits per dimension for the Morton interleave (two 16-bit dims →
    * one 32-bit key) and the bucket width used by [[zorderStats]]
    * (top 16 bits of the key → one bucket per 256×256 tile). */
  val ZBits = 16
  val ZBucketShift = 16

  /** Morton (Z-order) interleave of two non-negative integer columns,
    * spelled entirely in integer div/mod arithmetic so any engine
    * computes bit-identical keys:
    * `zkey = Σ_i ((x div 2^i) mod 2 + 2·((y div 2^i) mod 2)) · 4^i`.
    * Sorting or range-partitioning a table by this key co-locates rows
    * that are close in BOTH dimensions, which is what makes per-file
    * min/max skipping effective for two-column predicates — a linear
    * sort key cannot bound the second column. */
  def mortonKey(x: Column, y: Column, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** The same key as a SQL text expression (for the DuckDB oracle),
    * generated from the identical constants. */
  def mortonKeySql(x: String, y: String, bits: Int = ZBits): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"((($x // $p) % 2) + 2 * (($y // $p) % 2)) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")

  /** Z-order clustering audit: bucket rows by the top bits of the
    * Morton key and report each bucket's row count and min/max range
    * on both dimensions — exactly the per-file statistics a
    * Z-ordered rewrite would give the scan planner. Tight per-bucket
    * ranges (vs the global min/max) are the data-skipping win; the
    * spec asserts the average bucket span is a small fraction of the
    * global span. One map pass + one hash aggregate on the bucket id. */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
      bucketShift: Int = ZBucketShift): DataFrame =
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("zkey", mortonKey(col("x"), col("y")))
      .withColumn("bucket",
        expr(s"zkey div ${1L << bucketShift}").cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
}
