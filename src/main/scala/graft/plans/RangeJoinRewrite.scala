package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a point-in-interval THETA join into the
  * bucketed EQUI join of [[graft.operators.RangeJoin]] automatically.
  *
  * A join whose only cross-side condition is `lo <= p AND p <= hi`
  * plans as BroadcastNestedLoopJoin — O(|L|·|R|) and a scale-killer
  * when neither side broadcasts (the UDP variant-in-gene-range shape,
  * reference dipper/sources/UDP.py:330-447). The rewrite assigns each
  * point `floor(p/w)` and explodes each interval onto the buckets it
  * overlaps, joining on bucket equality with the ORIGINAL predicate
  * kept as a residual — output-identical, shuffle-partitioned, and
  * skew-handled by AQE like any other equi join.
  *
  * Fires only when: inner join, no cross-side equality conjunct
  * already present (those hash-join natively — and this also makes the
  * rule a fixpoint, since its own output gains one), both bound
  * columns and the point column are integral, and all three are
  * deterministic. Installed by [[graft.GraftExtensions]]; width and
  * kill-switch via `spark.graft.rangeJoin.bucketWidth` / `.enabled`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** bucket(x) = floor(x / w) as long — the operator's exact math. */
  private def bucket(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  private def refsIn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean)
      return plan
    val width = conf.getConfString("spark.graft.rangeJoin.bucketWidth", "1024").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def crossSide(a: Expression, b: Expression) =
          (refsIn(a, left) && refsIn(b, right)) ||
            (refsIn(a, right) && refsIn(b, left))
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => crossSide(a, b)
          case EqualNullSafe(a, b) => crossSide(a, b)
          case _ => false
        }
        // normalized (point >= bound) and (point <= bound) cross-side pairs
        val lowers = conjuncts.collect {
          case GreaterThanOrEqual(p, lo) if crossSide(p, lo) => (p, lo)
          case LessThanOrEqual(lo, p) if crossSide(lo, p) => (p, lo)
        }
        val uppers = conjuncts.collect {
          case LessThanOrEqual(p, hi) if crossSide(p, hi) => (p, hi)
          case GreaterThanOrEqual(hi, p) if crossSide(hi, p) => (p, hi)
        }
        val matched = (for {
          (p1, lo) <- lowers
          (p2, hi) <- uppers
          if p1.semanticEquals(p2)
          if isIntegral(p1) && isIntegral(lo) && isIntegral(hi)
          if p1.deterministic && lo.deterministic && hi.deterministic
          // p on one side, BOTH bounds on the other
          if (refsIn(p1, left) && refsIn(lo, right) && refsIn(hi, right)) ||
            (refsIn(p1, right) && refsIn(lo, left) && refsIn(hi, left))
        } yield (p1, lo, hi)).headOption
        matched match {
          case Some((p, lo, hi)) if !hasEqui =>
            val pointOnLeft = refsIn(p, left)
            val (pointSide, ivalSide) = if (pointOnLeft) (left, right) else (right, left)
            val pb = Alias(bucket(p, width), "__pbucket")()
            val pointProj = Project(pointSide.output :+ pb, pointSide)
            // Sequence is TimeZoneAware — unresolved without an explicit tz
            val seqExpr = new Sequence(bucket(lo, width), bucket(hi, width))
              .withTimeZone(conf.sessionLocalTimeZone)
              .asInstanceOf[Sequence]
            val rb = AttributeReference("__rbucket", LongType,
              nullable = seqExpr.dataType.asInstanceOf[ArrayType].containsNull)()
            // an inverted interval (hi < lo: sentinel rows, bad data) makes
            // Sequence default to step -1 and explode |bucket(lo)-bucket(hi)|
            // rows the residual then discards — correct but unbounded per bad
            // row. No point can satisfy lo <= p <= hi there, so pre-filtering
            // lo <= hi (null-rejecting, like the residual) is output-identical.
            val ivalGen = Generate(Explode(seqExpr), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(rb),
              child = Filter(LessThanOrEqual(lo, hi), ivalSide))
            val newCond = And(EqualTo(pb.toAttribute, rb), cond)
            val (nl, nr) = if (pointOnLeft) (pointProj, ivalGen) else (ivalGen, pointProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case _ => j
        }
    }
  }
}
