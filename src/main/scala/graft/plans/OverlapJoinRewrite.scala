package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule turning a pure interval-overlap inner join into the
  * binned equi join of [[graft.operators.Interval.overlapJoin]] — but
  * transparently, at the logical-plan level, for joins written as plain
  * SQL/DataFrame inequality conditions.
  *
  * The target shape is Spark's worst case: an inner `Join` whose
  * condition has NO equi conjunct between the sides (those already plan
  * as hash/merge joins) but does contain the overlap pair
  * `l.start <= r.end AND r.start <= l.end` (any mix of `<`/`<=`,
  * either operand order). Without this rule such a join physical-plans
  * as BroadcastNestedLoopJoin or a cartesian product — O(|L|·|R|)
  * comparisons, the classic 100 TB killer for temporal/range analytics.
  *
  * Rewrite (Chawda et al., EDBT'14 bucketed interval join; the same
  * shape `Interval.overlapJoin` uses as an explicit operator): explode
  * each side over the fixed-width bins its interval spans, equi-join on
  * the bin, re-apply the ORIGINAL condition, and keep each matched pair
  * only in one canonical bin — the bin of `greatest(l.start, r.start)`
  * — so no pair double-counts. Only rows whose interval bounds are both
  * non-null are exploded: a NULL bound makes an overlap conjunct
  * non-true, so the inner join drops the row either way. Inverted
  * intervals (`start > end` — the original join can still match them
  * when the other side spans the gap) are handled exactly: each side
  * explodes over `least(s,e)..greatest(s,e)`, which always covers the
  * canonical bin of any pair the original condition admits (proof: the
  * canonical value `m = greatest(ls, rs)` satisfies `m >= ls >=
  * least(ls, le)`, and `m <= greatest(ls, le)` because either `m = ls`
  * or `m = rs <= le` by the overlap conjunct; symmetrically for the
  * right side). The rewritten join carries an equi key, so the rule
  * can never fire on its own output — idempotent under the fixed-point
  * optimizer batch.
  *
  * Off by default: binning needs an axis-width choice only the caller
  * can make. Enable with
  * `spark.conf.set("spark.graft.overlapJoin.binWidth", <w>)` — pick w
  * on the order of a typical interval length, so each row lands in
  * O(1) bins. Integral interval bounds only (tinyint..bigint, e.g.
  * epoch days/seconds); timestamps should be projected to epoch
  * numbers upstream.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule),
  * alongside [[DailyRollupPushdown]].
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.overlapJoin.binWidth"

  /** Marker name for the generated bin attributes (visible in explain —
    * the plan-shape tests grep for it). */
  val BinColName = "__graft_overlap_bin"

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width =
      try conf.getConfString(BinWidthKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, width).getOrElse(j)
    }
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case o => Seq(o)
  }

  /** Normalize a comparison conjunct to (lo, hi) meaning lo ≤/< hi. */
  private def loHi(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, width: Long): Option[LogicalPlan] = {
    val conjuncts = split(cond)
    def fromLeft(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression): Boolean =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    def crossEqui(a: Expression, b: Expression): Boolean =
      (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))

    // An equi conjunct means Catalyst already has a hash-join key (and
    // means this may be our own output) — leave the plan alone.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossEqui(a, b)
      case EqualNullSafe(a, b) => crossEqui(a, b)
      case _ => false
    }
    if (hasEqui) return None

    // The overlap pair: one bound flowing each direction.
    val l2r = conjuncts.iterator.flatMap(loHi).collectFirst {
      case (lo, hi) if fromLeft(lo) && fromRight(hi) => (lo, hi)
    }
    val r2l = conjuncts.iterator.flatMap(loHi).collectFirst {
      case (lo, hi) if fromRight(lo) && fromLeft(hi) => (lo, hi)
    }
    val ((startL, endR), (startR, endL)) =
      (l2r, r2l) match { case (Some(a), Some(b)) => (a, b); case _ => return None }
    if (!Seq(startL, endL, startR, endR).forall(e =>
        integralTypes.contains(e.dataType))) return None

    val w = Literal(width)
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    // sign-safe floor bin, the overlapJoin recipe: (x - pmod(x, w)) / w
    def bin(e: Expression): Expression = {
      val x = toLong(e)
      IntegralDivide(Subtract(x, Pmod(x, w)), w)
    }

    def explodeBins(side: LogicalPlan, s: Expression, e: Expression)
        : (LogicalPlan, Attribute) = {
      val filtered = Filter(And(IsNotNull(s), IsNotNull(e)), side)
      // TimeZoneAwareExpression: Sequence resolves only with a zone set,
      // even on a pure integral axis
      val gen = Explode(Sequence(
        bin(Least(Seq(toLong(s), toLong(e)))),
        bin(Greatest(Seq(toLong(s), toLong(e)))),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
      val f = gen.elementSchema.head
      val attr = AttributeReference(BinColName, f.dataType, f.nullable)()
      (Generate(gen, Nil, outer = false, None, Seq(attr), filtered), attr)
    }
    val (genL, binL) = explodeBins(left, startL, endL)
    val (genR, binR) = explodeBins(right, startR, endR)

    val canonical = EqualTo(binL,
      bin(Greatest(Seq(toLong(startL), toLong(startR)))))
    val newCond = And(EqualTo(binL, binR), And(cond, canonical))
    Some(Project(j.output, Join(genL, genR, Inner, Some(newCond), hint)))
  }
}
