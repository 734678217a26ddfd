package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality estimator whose ESTIMATE is exactly replayable, unlike
  * HLL: hash every value with the repo's deterministic md5-hex8
  * integer (uniform on [0, 2³²)), keep each group's k smallest
  * distinct hashes, and estimate distinct = (k−1)·2³² / h_k (the k-th
  * minimum). Groups that never fill their sketch (< k distinct
  * hashes) report their EXACT distinct count. Bar-Yossef et al. 2002;
  * the same estimator DataSketches ships as theta sketches.
  *
  * Next to the engine's `hll_sketch_agg` rollup this adds the sketch
  * whose every output bit both engines can recompute: hash, rank,
  * ratio are all integer arithmetic, so the DuckDB oracle replays the
  * estimator itself rather than only sanity-checking it.
  *
  * MERGE is set union + re-truncate: the k smallest of the union of
  * per-group k-min sets equal the k smallest of the union of the FULL
  * hash sets (anything evicted from a group sketch is larger than k
  * survivors, so it cannot enter the merged top-k). The `__all__` row
  * is that merge across every group — the cross-slice rollup a
  * pre-aggregated sketch store serves without rescanning facts.
  *
  * Scale: one distinct on (group, hash), then [[TopKPerKey]]'s bounded
  * per-partition heaps (at most k·partitions rows per group move in
  * the rank shuffle, never the whole group). No unbounded
  * collect_set, no driver state. */
object KmvSketch {

  val K = 128
  val HashSpan = 4294967296L // 2^32

  /** `(group, n_kept, kth_hash, est_distinct)` per group plus the
    * merged `__all__` row. */
  def kmvDistinct(df: DataFrame, key: String, value: String,
      k: Int = K): DataFrame = {
    val h = expr(s"CAST(conv(substring(md5(CAST($value AS STRING)), " +
      "1, 8), 16, 10) AS BIGINT)")
    val dh = df.select(col(key).cast("string").as("grp"), h.as("h"))
      .distinct()
      .withColumn("nh", -col("h")) // TopKPerKey keeps LARGEST ord
    val kept = TopKPerKey.topKPerKey(dh, Seq("grp"), "nh", "h", k)
      .select(col("grp"), col("nh"), col("h"))
    val mergedKept = TopKPerKey.topKPerKey(
      kept.select(lit("__all__").as("grp"), col("nh"), col("h"))
        .distinct(),
      Seq("grp"), "nh", "h", k)
      .select(col("grp"), col("nh"), col("h"))
    val estNum = (k - 1).toLong * HashSpan
    kept.unionByName(mergedKept)
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        max(col("h")).cast("long").as("kth_hash"))
      .select(col("grp").as(key), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"$estNum div greatest(kth_hash, 1)"))
          .cast("long").as("est_distinct"))
  }
}
