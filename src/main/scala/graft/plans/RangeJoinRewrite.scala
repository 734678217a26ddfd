package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join,
  JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite a naive point-in-interval theta
  * join into the bucketed equi-join shape of
  * [[graft.operators.RangeJoin.pointInRange]] — automatically.
  *
  * Spark plans `p JOIN i ON p.key = i.key AND p.ts BETWEEN i.s AND
  * i.e` as a (broadcast) nested-loop join: per-key quadratic, the
  * classic 100 TB casualty. This rule detects the shape on any
  * resolved inner join — two inclusive timestamp bounds `P >= S` and
  * `P <= E` with `P` from one side and `S`,`E` from the other — and
  * rewrites to:
  *
  *   - points side: project an epoch-second bucket `floor(unix/W)`
  *   - intervals side: drop `E < S` rows (they match nothing under the
  *     containment predicate, and `sequence` would build a descending
  *     garbage array), then `explode(sequence(S_bucket, E_bucket))`
  *   - join: original condition AND bucket equality — the equi-pred
  *     turns the nested loop into a hash/sort-merge join; the original
  *     bounds stay in the condition so containment is exact and every
  *     qualifying pair is produced exactly once (a point lives in one
  *     bucket)
  *
  * Result-identical to the naive join for every input: null keys/ts
  * fall out of both forms the same way, dirty `E < S` intervals match
  * nothing in both, and an interval spanning more than
  * `maxBucketsPerInterval` buckets RAISES (a mis-sized `bucketSeconds`
  * would otherwise explode one task's memory — same contract as the
  * manual operator).
  *
  * Fixed-point safety: optimizer batches iterate to a fixed point, so
  * the rule must not re-fire on its own output (each re-fire would add
  * another Generate). The rewritten join's children expose the
  * `__graft_rb` bucket columns, and the rule skips any join whose
  * children contain `__`-prefixed columns — which also keeps it clear
  * of the library's own pre-bucketed operators (`__b` in RangeJoin,
  * `__p`/`__side` in AsOfJoin). `__` column names are reserved
  * internals throughout this library.
  *
  * Injection: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (new sessions) or `spark.experimental.extraOptimizations :+=
  * RangeJoinRewrite` (an existing session). Tunables (runtime confs):
  * `spark.graft.rangeJoinRewrite.enabled` (default true),
  * `.bucketSeconds` (86400), `.maxBucketsPerInterval` (100000).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.rangeJoinRewrite.enabled"
  val BucketKey = "spark.graft.rangeJoinRewrite.bucketSeconds"
  val MaxBucketsKey = "spark.graft.rangeJoinRewrite.maxBucketsPerInterval"
  private val BucketCol = "__graft_rb"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else {
      val w = conf.getConfString(BucketKey, "86400").toLong
      val maxB = conf.getConfString(MaxBucketsKey, "100000").toLong
      require(w > 0, s"$BucketKey must be positive")
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if j.resolved && !hasInternal(left) && !hasInternal(right) =>
          rewrite(left, right, cond, hint, w, maxB).getOrElse(j)
      }
    }
  }

  private def hasInternal(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith("__"))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** Normalize an inclusive timestamp comparison to (big, small). */
  private def asGeq(e: Expression): Option[(Attribute, Attribute)] = e match {
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
        if a.dataType == TimestampType && b.dataType == TimestampType =>
      Some((a, b))
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
        if a.dataType == TimestampType && b.dataType == TimestampType =>
      Some((b, a))
    case _ => None
  }

  /** floor(epoch_seconds / w) — float division then floor, exactly the
    * manual operator's bucketing (double is exact to 2^53, far past
    * any epoch second). Monotone, so containment implies bucket
    * containment. */
  private def bucket(ts: Expression, w: Long): Expression =
    Floor(new Divide(Cast(UnixSeconds(ts), DoubleType), Literal(w.toDouble)))

  /** 0 = left, 1 = right, -1 = neither. */
  private def sideOf(a: Attribute, l: LogicalPlan, r: LogicalPlan): Int =
    if (l.outputSet.contains(a)) 0 else if (r.outputSet.contains(a)) 1 else -1

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long,
      maxB: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    val geqs = cs.flatMap(asGeq)
    // P >= S (lower) and E >= P (upper): P on one side, S,E on the other
    val candidates = for {
      (p1, s) <- geqs
      (e, p2) <- geqs
      if p1.semanticEquals(p2) && !s.semanticEquals(e)
      pSide = sideOf(p1, left, right)
      sSide = sideOf(s, left, right)
      if pSide >= 0 && sSide >= 0 && pSide != sSide &&
        sideOf(e, left, right) == sSide
    } yield (p1, s, e, pSide)
    candidates.headOption.map { case (p, s, e, pSide) =>
      val (pointPlan, intPlan) = if (pSide == 0) (left, right) else (right, left)
      val pb = Alias(bucket(p, w), BucketCol)()
      val p2 = Project(pointPlan.output :+ pb, pointPlan)
      val sb = bucket(s, w)
      val eb = bucket(e, w)
      // Sequence is TimeZoneAware: without an explicit zone the new
      // node is unresolved and plan validation rejects the rewrite
      val seqE: Expression =
        Sequence(sb, eb, None, Some(conf.sessionLocalTimeZone))
      val guarded = If(LessThan(new Subtract(eb, sb), Literal(maxB)), seqE,
        Cast(new RaiseError(Literal(
          s"rangeJoinRewrite: interval spans >= $maxB buckets of ${w}s — " +
            s"widen $BucketKey or clean the interval data")), seqE.dataType))
      val ibAttr = AttributeReference(BucketCol + "_i", LongType,
        nullable = false)()
      val i2 = Generate(Explode(guarded), Nil, outer = false, None,
        Seq(ibAttr), Filter(GreaterThanOrEqual(e, s), intPlan))
      val (newL, newR) = if (pSide == 0) (p2, i2) else (i2, p2)
      val newCond = (cs :+ EqualTo(pb.toAttribute, ibAttr))
        .reduce(And(_, _))
      Project(left.output ++ right.output,
        Join(newL, newR, Inner, Some(newCond), hint))
    }
  }
}
