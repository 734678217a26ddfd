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
  */
object RangeJoin {

  def pointInRange(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    val pb = points.withColumn("__b",
      floor(unix_timestamp(col(pointTs)) / bucketSeconds))
    val ib = intervals.withColumn("__b",
      explode(sequence(
        floor(unix_timestamp(col(startTs)) / bucketSeconds),
        floor(unix_timestamp(col(endTs)) / bucketSeconds))))
    pb.join(ib, keys :+ "__b")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__b")
  }
}
