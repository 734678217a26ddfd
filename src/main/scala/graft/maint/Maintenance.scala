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

  /** KMV size for [[columnStats]] NDV estimates. */
  val StatsNdvK = 256

  /** ANALYZE-style column statistics — the stats a cost-based
    * optimizer (and every data engineer's first profiling query) needs
    * per column: row/null counts, min/max, and an NDV estimate. The
    * scan cost is the point at 100 TB: the basic stats come from ONE
    * pass (an unpivot explode to (column, value) grain — bounded ×c
    * per row — feeding one map-side-combinable aggregate), and NDV
    * uses the X144 KMV sketch (bounded heaps; exact below k, never an
    * unbounded distinct per column). All LONG-valued inputs — the
    * caller maps each profiled column to an exact integer expression
    * (cents, units, keys), which is the repo-wide convention anyway.
    *
    * `(col_name, n_rows, n_null, min_val, max_val, ndv_kept,
    * ndv_est)`. */
  def columnStats(df: DataFrame, cols: Seq[(String, Column)],
      k: Int = StatsNdvK): DataFrame = {
    // Basic stats as ONE wide map-side-combinable aggregate over the
    // source scan — 4 expressions per column, no unpivot row blowup
    // (r16, guide §2.3 "aggregate before you shuffle": the previous
    // shape exploded ×c rows into a persisted frame and hash-
    // aggregated it; this shape shuffles 1 partial-agg row per task
    // and frees the ×c-row cache entirely). The 1-row result unpivots
    // to (col_name, stats) rows — a c-element explode of one row.
    // Group semantics are preserved exactly: the exploded struct was
    // never NULL, so every group held ALL rows (n_rows = COUNT(*)),
    // and min/max/n_null ignore or count NULL v identically; the
    // n_rows > 0 filter reproduces the GROUP BY's empty-input result.
    val aggs = cols.flatMap { case (n, c) =>
      val v = c.cast("long")
      Seq(count(lit(1)).cast("long").as(s"__nr_$n"),
        sum(when(v.isNull, 1L).otherwise(0L)).cast("long").as(s"__nn_$n"),
        min(v).cast("long").as(s"__mn_$n"),
        max(v).cast("long").as(s"__mx_$n"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { case (n, _) =>
        struct(lit(n).as("col_name"), col(s"__nr_$n").as("n_rows"),
          col(s"__nn_$n").as("n_null"), col(s"__mn_$n").as("min_val"),
          col(s"__mx_$n").as("max_val"))
      }: _*)).as("t"))
      .select(col("t.col_name").as("col_name"), col("t.n_rows").as("n_rows"),
        col("t.n_null").as("n_null"), col("t.min_val").as("min_val"),
        col("t.max_val").as("max_val"))
      .filter(col("n_rows") > 0)
    // the NDV leg keeps the unpivot (it needs per-column DISTINCT
    // values) but is now its single consumer — no persist needed
    val unpivoted = df.select(
      explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("col_name"), c.cast("long").as("v"))
      }: _*)).as("t"))
      .select(col("t.col_name").as("col_name"), col("t.v").as("v"))
    // distinct the VALUES before hashing: the hash set is identical
    // (distinct∘hash ≡ distinct∘hash∘distinct — the trailing distinct
    // still collapses hex8 collisions exactly like the oracle's
    // DISTINCT over hashes), but md5 runs ndv times instead of
    // |rows|·|cols| times — the digest was the scan's dominant CPU
    val dh = unpivoted.filter(col("v").isNotNull).distinct()
      .select(col("col_name"),
        expr("CAST(conv(substring(md5(CAST(v AS STRING)), 1, 8), 16, " +
          "10) AS BIGINT)").as("h"))
      .distinct().withColumn("nh", -col("h"))
    val estNum = (k - 1).toLong * graft.operators.KmvSketch.HashSpan
    val ndv = graft.operators.TopKPerKey
      .topKPerKey(dh, Seq("col_name"), "nh", "h", k)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).cast("long").as("ndv_kept"),
        max(col("h")).cast("long").as("kth"))
      .select(col("col_name"), col("ndv_kept"),
        when(col("ndv_kept") < k, col("ndv_kept"))
          .otherwise(expr(s"$estNum div greatest(kth, 1)"))
          .cast("long").as("ndv_est"))
    base.join(ndv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_val"), col("max_val"),
        coalesce(col("ndv_kept"), lit(0L)).as("ndv_kept"),
        coalesce(col("ndv_est"), lit(0L)).as("ndv_est"))
  }

  /** Pruning-audit geometry: coordinates HASH-fold (md5-hex8) onto a
    * 2^AuditBits square — content-derived and uniform at every SF, so
    * the probe geometry is scale-invariant (raw fixture key domains
    * are narrower than the probe box at small SFs; a production audit
    * would use the raw clustering columns directly). Buckets are the
    * key's top bits (1024 tiles of 32×32); the probe is the quarter
    * box [0, 255]² on both dims. */
  val AuditBits = 10
  val AuditBucketShift = 10
  val AuditBoxHi = 255L

  /** md5-hex8 fold of a column onto [0, 2^AuditBits). */
  private def auditCoordSql(c: String): String =
    s"(CAST(conv(substring(md5(CAST($c AS STRING)), 1, 8), 16, 10) " +
      s"AS BIGINT) % ${1L << AuditBits})"

  /** Data-skipping pruning audit — the measured answer to "what did
    * Z-ordering actually buy": the SAME points are bucketed two ways
    * (`zorder` = top Morton-key bits; `natural` = a key-hash layout, a
    * sorted-by-one-column table's worst case for the second column),
    * each bucket gets the min/max stats a file footer would hold, and
    * a two-dimensional box predicate is planned against both — a
    * bucket is SCANNED iff its bounding box intersects the probe box.
    * Output per layout: bucket/row totals, scanned counts, matching
    * rows (identical across layouts — pruning must never change the
    * answer), and the scanned-rows ppm the layout would actually read.
    *
    * Everything is integer div/mod arithmetic over content-derived
    * keys — no sampled range boundaries, so the report replays
    * bit-for-bit in any engine. One union of two projections, one
    * hash aggregate at (layout, bucket) grain, one 2-row rollup. */
  def pruningAudit(df: DataFrame, xCol: String, yCol: String,
      ordCol: String): DataFrame = {
    val side = 1L << AuditBits
    val pts = df.select(
      expr(auditCoordSql(xCol)).as("x"),
      expr(auditCoordSql(yCol)).as("y"),
      (col(ordCol).cast("long") % side).as("natbucket"))
    val both = pts
      .select(lit("zorder").as("layout"),
        expr(s"${mortonKeySql("x", "y", AuditBits)
          .replace("//", "div")} div ${1L << AuditBucketShift}")
          .cast("long").as("bucket"),
        col("x"), col("y"))
      .unionByName(pts.select(lit("natural").as("layout"),
        col("natbucket").as("bucket"), col("x"), col("y")))
    val inBox = when(col("x") <= AuditBoxHi && col("y") <= AuditBoxHi,
      1L).otherwise(0L)
    val buckets = both
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("x")).as("x_min"), min(col("y")).as("y_min"),
        sum(inBox).cast("long").as("n_match"))
      // box lo is 0 and coords are non-negative, so the bounding box
      // intersects the probe iff both mins are inside it
      .withColumn("scanned",
        when(col("x_min") <= AuditBoxHi && col("y_min") <= AuditBoxHi,
          1L).otherwise(0L))
    buckets.groupBy(col("layout"))
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(col("scanned")).cast("long").as("n_scanned"),
        sum(col("n_rows")).cast("long").as("rows_total"),
        sum(col("scanned") * col("n_rows")).cast("long")
          .as("rows_scanned"),
        sum(col("n_match")).cast("long").as("rows_matching"))
      .select(col("layout"), col("n_buckets"), col("n_scanned"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        expr("(rows_scanned * 1000000) div rows_total").as("scan_ppm"))
  }
}
