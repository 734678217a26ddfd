package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule (X318): rewrite a plain inner equi-join to
  * the SALTED form of [[graft.core.ScaleJoins.saltedJoin]] —
  * automatically, driven by a REGISTERED skew profile.
  *
  * The manual X47 operator and the X61 diagnostic
  * ([[graft.core.ScaleJoins.keySkewProfile]]) leave a gap: someone has
  * to read the profile and rewrite the query by hand. This rule closes
  * it. A pipeline registers the measured hot keys of a join column as
  * a runtime conf (`spark.graft.saltedJoin.hotKeys.<column> =
  * v1,v2,…`); any subsequent PLAIN equi-join on that column is
  * rewritten so the hot keys' rows spread over
  * `spark.graft.saltedJoin.salts` shuffle sub-keys:
  *
  *  - the side OWNING the registered column (the fact side — skew
  *    profiles are taken on the fact) gets a salt column: a hot-key
  *    row takes `pmod(xxhash64(row), salts)` (the whole-row hash of
  *    the manual operator — deterministic, no rand() in the plan), a
  *    cold row takes 0;
  *  - the other side replicates: a hot-key row explodes
  *    `sequence(0, salts−1)`, a cold row `array(0)` — cold keys pay
  *    exactly one copy, so the rewrite costs nothing where there is
  *    no skew;
  *  - the join gains the `salt = salt` conjunct; a hot left row with
  *    salt s meets exactly the one replica with salt s, so every
  *    qualifying pair is produced exactly once and the result is
  *    IDENTICAL to the plain join by construction (null keys fall out
  *    of the `In` probe into the cold branch and then out of the
  *    original equi-predicate, exactly as before).
  *
  * At 100 TB this is the difference between one reduce task owning a
  * hot key's TBs and `salts` tasks sharing them — without touching
  * query code. AQE's skew-join handles the SORT-MERGE case at
  * runtime; this rule also covers the shapes AQE skew handling does
  * not (e.g. a skewed shuffled hash join, or a pre-AQE static plan),
  * and makes the mitigation explicit and plan-assertable.
  *
  * Fixed-point safety: the salt columns are `__`-prefixed and the rule
  * skips joins whose children already expose `__` columns (the
  * library-wide reserved-internals convention shared with
  * [[RangeJoinRewrite]]).
  *
  * Tunables (runtime confs): `spark.graft.saltedJoin.enabled`
  * (default FALSE — the rewrite only runs where a profile was
  * deliberately registered), `.salts` (default 8),
  * `.hotKeys.<column>` (comma-separated values, cast to the key's
  * type).
  */
object SaltedJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.saltedJoin.enabled"
  val SaltsKey = "spark.graft.saltedJoin.salts"
  val HotKeysPrefix = "spark.graft.saltedJoin.hotKeys."
  private val SaltCol = "__graft_salt"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else {
      val salts = conf.getConfString(SaltsKey, "8").toLong
      require(salts > 0, s"$SaltsKey must be positive")
      val profiles: Map[String, Seq[String]] = conf.getAllConfs
        .collect { case (k, v) if k.startsWith(HotKeysPrefix) &&
            v.trim.nonEmpty =>
          k.stripPrefix(HotKeysPrefix) ->
            v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        }
      if (profiles.isEmpty) plan
      else plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if j.resolved && !hasInternal(left) && !hasInternal(right) =>
          rewrite(left, right, cond, hint, profiles, salts).getOrElse(j)
      }
    }
  }

  private def hasInternal(p: LogicalPlan): Boolean =
    p.output.exists(_.name.startsWith("__"))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint,
      profiles: Map[String, Seq[String]], salts: Long)
      : Option[LogicalPlan] = {
    // an equi-conjunct whose two sides are attributes of the two
    // children, one of which carries a registered skew profile under
    // its column name — that attribute's side is the skewed (fact)
    // side the profile was measured on
    val candidates = conjuncts(cond).flatMap {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (la, ra) =
          if (left.outputSet.contains(a) && right.outputSet.contains(b))
            (Some(a), Some(b))
          else if (left.outputSet.contains(b) && right.outputSet.contains(a))
            (Some(b), Some(a))
          else (None, None)
        (la, ra) match {
          case (Some(l), Some(r)) if profiles.contains(l.name) =>
            Some((l, r, 0))
          case (Some(l), Some(r)) if profiles.contains(r.name) =>
            Some((r, l, 1))
          case _ => None
        }
      case _ => None
    }
    candidates.headOption.map { case (hotAttr, coldAttr, skewSide) =>
      val (skewPlan, repPlan) =
        if (skewSide == 0) (left, right) else (right, left)
      def hotIn(k: AttributeReference): Expression =
        In(k, profiles(hotAttr.name)
          .map(v => Cast(Literal(v), k.dataType)))
      // skewed side: hot rows spread over the salt space via the
      // whole-row hash (the manual operator's spelling), cold rows 0
      val saltAlias = Alias(If(hotIn(hotAttr),
        Pmod(new XxHash64(skewPlan.output), Literal(salts)),
        Literal(0L)), SaltCol)()
      val skew2 = Project(skewPlan.output :+ saltAlias, skewPlan)
      // replicated side: hot rows take every salt, cold rows just 0
      // Sequence is TimeZoneAware even over integrals: without an
      // explicit zone the node stays unresolved (the RangeJoinRewrite
      // lesson)
      val seqE: Expression = Sequence(Literal(0L), Literal(salts - 1L),
        None, Some(conf.sessionLocalTimeZone))
      val repSaltAttr = AttributeReference(SaltCol + "_r", LongType,
        nullable = false)()
      val rep2 = Generate(
        Explode(If(hotIn(coldAttr), seqE, CreateArray(Seq(Literal(0L))))),
        Nil, outer = false, None, Seq(repSaltAttr), repPlan)
      val (newL, newR) = if (skewSide == 0) (skew2, rep2) else (rep2, skew2)
      val newCond = And(cond, EqualTo(saltAlias.toAttribute, repSaltAttr))
      Project(left.output ++ right.output,
        Join(newL, newR, Inner, Some(newCond), hint))
    }
  }
}
