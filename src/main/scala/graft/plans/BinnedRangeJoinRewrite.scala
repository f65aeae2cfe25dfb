package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Logical rewrite of point-in-interval theta joins.
  *
  * Spark plans `points JOIN intervals ON p >= s AND p <= e` (no equality
  * conjunct) as a broadcast-nested-loop join — O(|P|·|I|), the exact trap
  * called out in SURVEY §4 item 3. This rule rewrites the join into the
  * binned form the library's `operators.IntervalJoin` builds by hand:
  *
  *   points + bucket(p)  ⋈__bucket  explode(sequence(bucket(s), bucket(e)))
  *   with the original range condition as a residual filter
  *
  * so Catalyst plans a shuffled hash/sort-merge join. Applies only when
  * the condition has no equality conjunct (otherwise hashing already
  * works) and the three sides are timestamp-typed. The rewritten join
  * carries an equality conjunct, which also makes the rule idempotent.
  *
  * Bucket width is fixed (1 day) — a conf would tune it; correctness does
  * not depend on it, only the explode factor does.
  */
object BinnedRangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketSeconds = 86400L

  private def isTime(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  private def tzId: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def epochSeconds(e: Expression): Expression = {
    // optimizer-stage expressions bypass the analyzer, so timezone-aware
    // nodes must be constructed with the session zone already bound
    val ts = if (e.dataType == TimestampType) e else Cast(e, TimestampType, tzId)
    UnixSeconds(ts)
  }

  private def bucketOf(e: Expression): Expression =
    // truncating division is monotone non-decreasing, which is all the
    // covering property needs (epochs here are positive anyway)
    IntegralDivide(epochSeconds(e), Literal(BucketSeconds))

  /** extract (point, start, end) when cond is `p >= s && p <= e` (any
    * conjunct order, >=/> and <=/< accepted) with p fully from one side
    * and s, e fully from the other. */
  private def matchRange(
      cond: Expression,
      leftOut: AttributeSet,
      rightOut: AttributeSet): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    def lower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case GreaterThan(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case LessThan(s, p) => Some((p, s))
      case _ => None
    }
    def upper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, t) => Some((p, t))
      case LessThan(p, t) => Some((p, t))
      case GreaterThanOrEqual(t, p) => Some((p, t))
      case GreaterThan(t, p) => Some((p, t))
      case _ => None
    }
    val candidates = Seq(
      (lower(conjuncts(0)), upper(conjuncts(1))),
      (lower(conjuncts(1)), upper(conjuncts(0))))
    candidates.collectFirst {
      case (Some((p1, s)), Some((p2, e)))
          if p1.semanticEquals(p2) && isTime(p1) && isTime(s) && isTime(e) &&
            p1.references.nonEmpty && s.references.nonEmpty && e.references.nonEmpty &&
            ((p1.references.subsetOf(leftOut) && (s.references ++ e.references).subsetOf(rightOut)) ||
             (p1.references.subsetOf(rightOut) && (s.references ++ e.references).subsetOf(leftOut))) =>
        val pointOnLeft = p1.references.subsetOf(leftOut)
        (p1, s, e, pointOnLeft)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if matchRange(cond, left.outputSet, right.outputSet).isDefined =>
      val (p, s, e, pointOnLeft) = matchRange(cond, left.outputSet, right.outputSet).get
      val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)

      val pb = Alias(bucketOf(p), "__pb")()
      val pointPlan = Project(pointSide.output :+ pb, pointSide)

      val ib = AttributeReference("__ib", LongType, nullable = true)()
      // inverted intervals (end before start — dirty data at scale) must
      // generate NO buckets: the pre-rewrite theta join matched nothing
      // for such a row, while a bare ascending Sequence RAISES "Illegal
      // sequence boundaries" at runtime — the rewrite would turn a
      // silently-unmatched row into a job failure. (Null bounds already
      // behave: Sequence is null-intolerant → null array → Explode emits
      // nothing, and a null If-predicate takes the empty branch.)
      val bs = bucketOf(s)
      val be = bucketOf(e)
      val gen = Explode(If(LessThanOrEqual(bs, be),
        Sequence(bs, be, Some(Literal(1L)), tzId),
        Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))))
      val intervalPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(ib), child = intervalSide)

      val newCond = And(EqualTo(pb.toAttribute, ib), cond)
      val (nl, nr) = if (pointOnLeft) (pointPlan, intervalPlan) else (intervalPlan, pointPlan)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
  }
}
