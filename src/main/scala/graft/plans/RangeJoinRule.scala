package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a PURE bounded range join — an inner join whose
  * only usable predicate is `r.t >= l.s AND r.t < l.s + C` with no
  * equi-key conjunct — into a hash join on derived time bins.
  *
  * Spark plans such joins as BroadcastNestedLoopJoin: O(n·m) comparisons,
  * dead at 100 TB. The rewrite explodes each left interval into the ≤2
  * C-width bins it covers, projects the right time's bin, and joins on
  * bin equality with the ORIGINAL range predicates kept as the exact
  * filter — so results are identical and the plan becomes a shuffle hash
  * join whose cost is linear in rows. Truncating division bins negatives
  * consistently on both sides, and the sequence lo..hi covers every bin a
  * value in [s, s+C) can land in, so the candidate set is always a
  * superset: soundness does not depend on sign or alignment.
  *
  * Joins that already carry an equi conjunct hash-join fine natively and
  * are left untouched; after one application the bin equality IS an equi
  * conjunct, which also makes the rule idempotent. */
object RangeJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val cs = conjuncts(cond)
      val hasEqui = cs.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      val range = findRange(cs, left, right)
      if (hasEqui || range.isEmpty) j
      else {
        val (rt, ls, width) = range.get
        val binLit = Literal(width, LongType)
        val lo = IntegralDivide(ls, binLit)
        val hi = IntegralDivide(Add(ls, Literal(width - 1, LongType)), binLit)
        val binAttr = AttributeReference("_graft_bin", LongType)()
        // Sequence is TimeZoneAwareExpression: unresolved until tz is set
        val seq = Sequence(lo, hi, None, Some(conf.sessionLocalTimeZone))
        val genLeft = Generate(Explode(seq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = left)
        val rbin = Alias(IntegralDivide(rt, binLit), "_graft_rbin")()
        val projRight = Project(right.output :+ rbin, right)
        val newCond = (EqualTo(binAttr, rbin.toAttribute) +: cs).reduce(And)
        Project(j.output,
          Join(genLeft, projRight, Inner, Some(newCond), hint))
      }
  }

  /** find (rightTime, leftStart, width): r.t >= l.s and r.t < l.s + C,
    * both LongType, each side referencing only its own plan */
  private def findRange(cs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet) && e.dataType == LongType
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet) && e.dataType == LongType
    val lowers = cs.collect {
      case GreaterThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => (a, b)
      case LessThanOrEqual(b, a) if fromRight(a) && fromLeft(b) => (a, b)
    }
    val uppers = cs.collect {
      case LessThan(a, Add(b, Literal(c: Long, LongType), _)) if fromRight(a) && fromLeft(b) && c > 0 =>
        (a, b, c)
      case GreaterThan(Add(b, Literal(c: Long, LongType), _), a) if fromRight(a) && fromLeft(b) && c > 0 =>
        (a, b, c)
    }
    (for {
      (rt, ls) <- lowers
      (rt2, ls2, c) <- uppers
      if rt.semanticEquals(rt2) && ls.semanticEquals(ls2)
    } yield (rt, ls, c)).headOption
  }
}

/** installer for an existing session (config-time route:
  * `spark.sql.extensions=graft.functions.GraftExtensions`) */
object GraftOptimizations {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRule
}
