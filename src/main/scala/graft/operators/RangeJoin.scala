package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop. Spark plans a
  * raw `p.ts BETWEEN i.start AND i.end` theta join as a (broadcast)
  * nested-loop — per-key quadratic and a guaranteed casualty at scale.
  * The bucketed form is the standard fix: quantize time into
  * fixed-width buckets, explode each interval into the buckets it
  * covers, and equi-join on (key, bucket) before the exact containment
  * filter.
  *
  * Cost: |points| + |intervals| · (interval span / bucket width), all
  * through one hash-partitioned equi-join — tune `bucketSeconds` to
  * the typical interval length so the explode factor stays small. Each
  * qualifying (point, interval) pair is produced exactly once (the
  * point lives in exactly one bucket), so no dedup pass is needed.
  *
  * Contract: key column names are shared; all other point/interval
  * column names must be disjoint (rename before calling).
  *
  * Dirty-data guards (the explode is the failure surface): an interval
  * with `end < start` matches nothing under the containment filter, so
  * such rows are DROPPED before the explode — otherwise `sequence`
  * builds a descending garbage array. An interval spanning more than
  * `maxBucketsPerInterval` buckets (a far-future end, or bucketSeconds
  * mis-sized by orders of magnitude) would explode into an array big
  * enough to OOM one task — that is a caller error, so it RAISES at
  * execution time instead of silently burning the scale claim.
  */
object RangeJoin {

  def pointInRange(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val pb = points.withColumn("__b",
      floor(unix_timestamp(col(pointTs)) / bucketSeconds))
    val sb = floor(unix_timestamp(col(startTs)) / bucketSeconds)
    val eb = floor(unix_timestamp(col(endTs)) / bucketSeconds)
    val ib = intervals
      .filter(col(endTs) >= col(startTs))
      .filter(assert_true(eb - sb < lit(maxBucketsPerInterval),
        lit(s"pointInRange: interval spans >= $maxBucketsPerInterval " +
          s"buckets of ${bucketSeconds}s — widen bucketSeconds or clean " +
          "the interval data")).isNull)
      .withColumn("__b", explode(sequence(sb, eb)))
    pb.join(ib, keys :+ "__b")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__b")
  }

  /** LEFT OUTER point-in-interval range join (X258's batch face): every
    * point row emits — matched pairs exactly as [[pointInRange]], and
    * points inside NO interval once, null-padded on the interval side.
    * The outer form cannot ride the bucket equi-join directly (a point
    * matching no interval in ONE bucket is not yet globally unmatched),
    * so the standard decomposition applies: the bucketed INNER join
    * finds all pairs, a LEFT ANTI join on the point identity (all point
    * columns — they must be non-null; exact duplicate point rows each
    * emit their own null row, ordinary left-join multiplicity) finds
    * the never-matched points, and the union is the left-outer result.
    * Both legs are hash equi-joins — still no nested loop anywhere.
    *
    * Cost: the inner join as before, plus one anti-join shuffle on the
    * point identity — linear in |points| + |pairs|, the price of the
    * global "no match anywhere" verdict. */
  def pointInRangeLeft(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val matched = pointInRange(points, intervals, keys, pointTs,
      startTs, endTs, bucketSeconds, maxBucketsPerInterval)
    val pointCols = points.columns.toSeq
    val unmatched = points.join(
      matched.select(pointCols.map(col): _*), pointCols, "left_anti")
    val padded = matched.columns.filterNot(pointCols.contains)
      .foldLeft(unmatched)((df, c) =>
        df.withColumn(c, lit(null).cast(matched.schema(c).dataType)))
    matched.unionByName(padded)
  }
}
