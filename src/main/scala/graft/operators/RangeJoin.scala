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
    * finds all pairs, a LEFT ANTI join on a synthetic row id captured
    * BEFORE the inner leg finds the never-matched points, and the
    * union is the left-outer result. Both legs are hash equi-joins —
    * still no nested loop anywhere.
    *
    * The anti-join uses NULL-SAFE equality (`<=>`) over every point
    * column: null-unsafe equality would count a matched point row
    * carrying a null attribute as "globally unmatched" too — a
    * spurious null-padded duplicate (the r12 verdict bug). A synthetic
    * `monotonically_increasing_id` is deliberately NOT used: the id is
    * recomputed independently by the matched leg and the anti leg, and
    * above an AQE-coalesced shuffle the two recomputations can assign
    * DIFFERENT ids to the same row (observed at sf0.1), silently
    * corrupting the verdict unless the stamped frame is materialized —
    * a full-input persist this operator must not impose at 100 TB.
    * Null-safe equality is deterministic by construction, stays a hash
    * equi-join, and multiplicity is exact: value-identical point rows
    * necessarily share one match status, so unmatched duplicates each
    * emit their own null row and matched ones each emit their pairs.
    *
    * Cost: the inner join as before, plus one anti-join shuffle on the
    * point columns — linear in |points| + |pairs|, the price of the
    * global "no match anywhere" verdict. */
  def pointInRangeLeft(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val matched = pointInRange(points, intervals, keys, pointTs,
      startTs, endTs, bucketSeconds, maxBucketsPerInterval)
    val unmatched = antiOnAllColumns(points, matched)
    val padded = matched.columns.filterNot(points.columns.contains)
      .foldLeft(unmatched)((df, c) =>
        df.withColumn(c, lit(null).cast(matched.schema(c).dataType)))
    matched.unionByName(padded)
  }

  /** `own LEFT ANTI matchedProjection` on ALL of `own`'s columns with
    * null-safe equality; the matched side is renamed first so the
    * shared lineage cannot trip self-join ambiguity. */
  private def antiOnAllColumns(own: DataFrame,
      matched: DataFrame): DataFrame = {
    val cols = own.columns.toSeq
    val m = matched.select(cols.map(c => col(c).as(s"__m_$c")): _*)
    own.join(m, cols.map(c => col(c) <=> col(s"__m_$c")).reduce(_ && _),
      "left_anti")
  }

  /** FULL OUTER point-in-interval range join (X270's batch face):
    * matched pairs exactly as [[pointInRange]], points inside NO
    * interval once (interval side null-padded), AND intervals covering
    * NO point once (point side null-padded) — "purchases with no view
    * AND views with no purchase" in one frame. Same decomposition as
    * [[pointInRangeLeft]] with the symmetric right-anti leg: each
    * side's anti-join runs null-safe over that side's own columns
    * (see [[pointInRangeLeft]] for why not a synthetic row id). Three
    * hash equi-joins total, all linear — no nested loop.
    *
    * Note the interval-side anti leg reuses [[pointInRange]]'s
    * dirty-data stance: an `end < start` interval matches nothing, so
    * it emits on the unmatched-interval leg (it IS an interval row,
    * just an empty one) — it is dropped only from pair finding. */
  def pointInRangeFull(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val matched = pointInRange(points, intervals, keys, pointTs,
      startTs, endTs, bucketSeconds, maxBucketsPerInterval)
    def pad(df: DataFrame, ownCols: Seq[String]): DataFrame =
      matched.columns.filterNot(ownCols.contains)
        .foldLeft(df)((d, c) =>
          d.withColumn(c, lit(null).cast(matched.schema(c).dataType)))
    val noInterval = pad(antiOnAllColumns(points, matched),
      points.columns.toSeq)
    val noPoint = pad(antiOnAllColumns(intervals, matched),
      intervals.columns.toSeq)
    matched.unionByName(noInterval).unionByName(noPoint)
  }
}
