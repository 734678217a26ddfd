package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — the time-series operator Spark's built-in set
  * lacks (DuckDB/kdb ship it natively): for every probe row, attach the
  * payload of the LAST build row with the same key and build.ts ≤
  * probe.ts (inclusive).
  *
  * Implemented by composition, not a custom physical operator: tag both
  * sides, `unionByName`, and take `last(payload, ignoreNulls)` over a
  * (key)-partitioned window ordered by (ts, side) — build rows sort
  * before probe rows at equal ts, which is exactly the ≤ semantics.
  *
  * Scale shape: ONE shuffle+sort of probe∪build on the key — the same
  * cost as any windowed aggregate — versus the naive range join
  * (`probe.ts >= build.ts` non-equi join), which Spark plans as a
  * per-key cross product: quadratic in events-per-key and a guaranteed
  * 100× scale-up casualty. A hot key concentrates one sort partition;
  * the standard mitigation (bucket the timeline: join on (key,
  * time_bucket) for bounded-staleness as-of) composes on top without
  * changing this operator.
  *
  * The payload travels as ONE packed struct so a build row whose
  * payload fields are all NULL still matches (`last(ignoreNulls)` skips
  * nulls; the struct wrapper is non-null whenever the row exists) and
  * the window computes a single `last`, not one per payload column.
  *
  * Determinism contract: `build` must be unique per (keys, ts) —
  * pre-aggregate duplicates (e.g. `max_by`) or ties would resolve by
  * partition order. Keys and ts must be NON-NULL: `Window.partitionBy`
  * groups SQL NULLs into one partition, so null-keyed rows would match
  * each other — equi-join/ASOF semantics never match NULL keys — and a
  * null ts would sort first rather than participate in the ≤ order.
  * Both are enforced: name collisions (reserved internals, payload vs
  * probe columns) fail at plan time via `require`; null keys/ts fail at
  * execution time via an `assert_true` guard, so a contract violation
  * is an error, never a silently wrong row. Probe columns pass through
  * untouched.
  */
object AsOfJoin {

  private val Reserved = Seq("__p", "__side", "__m")

  def asOf(probe: DataFrame, build: DataFrame, keys: Seq[String],
      ts: String, payload: Seq[String]): DataFrame =
    joined(probe, build, keys, ts, payload, forward = false)

  /** FORWARD as-of join — the symmetric production shape ("the next
    * maintenance after each failure", "the next price tick at-or-after
    * the order"): for every probe row, the payload of the FIRST build
    * row with the same key and build.ts ≥ probe.ts (inclusive). Same
    * union + one-window decomposition, same contracts and cost as the
    * backward form — the window frame just flips to
    * [currentRow, unboundedFollowing] with `first(ignoreNulls)`, and
    * at equal ts the probe sorts BEFORE the build row so the ≥ is
    * inclusive. Oracle = DuckDB's native `ASOF LEFT JOIN … ts <= ts`. */
  def asOfForward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      ts: String, payload: Seq[String]): DataFrame =
    joined(probe, build, keys, ts, payload, forward = true)

  private def joined(probe: DataFrame, build: DataFrame,
      keys: Seq[String], ts: String, payload: Seq[String],
      forward: Boolean): DataFrame = {
    val taken = (probe.columns ++ build.columns).toSet
    require(Reserved.forall(!taken.contains(_)),
      s"asOf: input columns collide with reserved internals $Reserved")
    val probeExtra = probe.columns.toSeq
      .filterNot(c => keys.contains(c) || c == ts)
    require(payload.intersect(probe.columns).isEmpty,
      s"asOf: payload columns ${payload.intersect(probe.columns)} shadow " +
        "probe columns — rename one side before joining")
    // execution-time null-contract guard: assert_true raises on the
    // first violating row (returns NULL when the contract holds, so the
    // isNull filter keeps every valid row and costs one codegen'd check)
    def nonNullGuard(df: DataFrame): DataFrame = {
      val ok = (keys :+ ts).map(col(_).isNotNull).reduce(_ && _)
      df.filter(assert_true(ok,
        lit(s"asOf: null key/ts — keys=$keys ts=$ts must be non-null"))
        .isNull)
    }
    val packedType = StructType(payload.map(c => build.schema(c)))
    val p = nonNullGuard(probe).select(
      (keys :+ ts).map(col) ++ probeExtra.map(col) ++ Seq(
        lit(null).cast(packedType).as("__p"), lit(1).as("__side")): _*)
    val b = nonNullGuard(build).select(
      (keys :+ ts).map(col) ++ probeExtra.map(c =>
        lit(null).cast(probe.schema(c).dataType).as(c)) ++ Seq(
        struct(payload.map(col): _*).as("__p"), lit(0).as("__side")): _*)
    // backward: build rows sort BEFORE probe at equal ts (≤ inclusive),
    // last() over the preceding frame. Forward: probe sorts BEFORE
    // build at equal ts (≥ inclusive), first() over the following frame.
    val w =
      if (forward)
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(ts).asc, col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col(ts).asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m =
      if (forward) first(col("__p"), ignoreNulls = true).over(w)
      else last(col("__p"), ignoreNulls = true).over(w)
    p.unionByName(b)
      .withColumn("__m", m)
      .filter(col("__side") === 1)
      .select((keys :+ ts).map(col) ++ probeExtra.map(col) ++
        payload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
