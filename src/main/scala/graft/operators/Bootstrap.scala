package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Poisson bootstrap error bars for grouped aggregates — the
  * single-pass answer to "how trustworthy is this 100 TB sum": classic
  * bootstrap resampling needs R full passes (or a materialized resample
  * per replicate); the Poisson bootstrap (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", Google 2012) replaces
  * "sample n rows with replacement" with an independent Poisson(1)
  * count PER ROW PER REPLICATE, so all R replicates stream through one
  * scan with a bounded ×R row expansion and ordinary map-side-
  * combinable aggregation.
  *
  * Determinism (the repo's oracle discipline): the per-(row, replicate)
  * Poisson draw is NOT random at query time — it inverts the Poisson(1)
  * CDF at the row's md5-hex8 hash, with the CDF baked as seven integer
  * thresholds on [0, 2³²) (constants of mathematics, interpolated into
  * both engines' SQL from this one list). Counts, replicate sums and
  * the spread statistics are all exact integers, so the whole
  * uncertainty computation hash-matches the DuckDB replay.
  *
  * Output per group: the true aggregate, replicate count, and the
  * bootstrap spread (min / lower-median / max of the replicate sums) —
  * the error bar a dashboard actually renders. */
object Bootstrap {

  /** Poisson(1) CDF at k = 0..6, scaled to [0, 2³²): a hash below
    * threshold k means "count ≤ k"; above all seven means count 7
    * (P ≈ 8·10⁻⁵ — the tail truncation is part of the operator's
    * definition, identically in both engines). */
  val PoissonCdfE32: Seq[Long] = Seq(1580030168L, 3160060337L,
    3950075421L, 4213413783L, 4279248373L, 4292415291L, 4294609777L)

  /** Number of bootstrap replicates. */
  val Replicates = 16

  /** The CDF inversion as SQL text over a given 32-bit hash
    * expression — the THRESHOLD STRUCTURE is shared between engines
    * (generated from [[PoissonCdfE32]]); only the hex8-of-md5 hash
    * spelling differs (Spark has `conv`, DuckDB uses the ascii-
    * arithmetic hex8 the oracles already carry). */
  def countSql(hash: String): String =
    PoissonCdfE32
      .map(t => s"(CASE WHEN $hash >= $t THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Spark-side hash of (key, replicate) — the draw seed. */
  def sparkHash(key: String, b: String): String =
    s"CAST(conv(substring(md5(concat(CAST($key AS STRING), ':', " +
      s"CAST($b AS STRING))), 1, 8), 16, 10) AS BIGINT)"

  /** `(group, n_rows, total_cents, boot_min, boot_med_lo, boot_max)`:
    * the exact grouped sum plus the spread of [[Replicates]] Poisson
    * resampled sums. `rowKey` must uniquely identify a row (the draw
    * seed); `cents` is the LONG measure. */
  def poissonBootstrap(df: DataFrame, group: String, rowKey: String,
      cents: String, replicates: Int = Replicates): DataFrame = {
    // The draw seed is CAST(rk AS STRING): a silent lossy cast here
    // (string id -> NULL long) would zero every Poisson count and
    // report all-zero error bars instead of failing — require an
    // integral key at plan time (the TopKPerKey device).
    val rkType = df.schema(df.schema.fieldIndex(rowKey)).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(rkType),
      s"poissonBootstrap: rowKey '$rowKey' must be an integral column " +
        s"(got $rkType) — a lossy cast would silently zero every draw")
    val base = df.select(col(group).as("grp"),
      col(rowKey).cast("long").as("rk"), col(cents).as("v"))
    val exact = base.groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("v")).cast("long").as("total_cents"))
    val reps = base
      .select(col("grp"), col("rk"), col("v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .withColumn("h", expr(sparkHash("rk", "b")))
      .withColumn("cnt", expr(countSql("h")).cast("long"))
      .groupBy(col("grp"), col("b"))
      .agg(sum(col("v") * col("cnt")).cast("long").as("rep_sum"))
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("rep_sum"))).as("sums"))
      .select(col("grp"),
        element_at(col("sums"), 1).as("boot_min"),
        element_at(col("sums"), (replicates + 1) / 2).as("boot_med_lo"),
        element_at(col("sums"), replicates).as("boot_max"))
    exact.join(reps, Seq("grp"))
      .select(col("grp").as(group), col("n_rows"), col("total_cents"),
        col("boot_min"), col("boot_med_lo"), col("boot_max"))
  }
}
