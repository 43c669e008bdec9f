package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Auto-rewrite of pure temporal-range joins into binned equi-joins (the
  * logical-plan twin of [[graft.ops.RangeJoin]], installed by
  * [[graft.GraftExtensions]]).
  *
  * A join whose ONLY usable predicates are range bounds —
  * `L.ts >= R.start AND L.ts < R.end` with no equi-conjunct — has no
  * equi-key for Spark to hash/sort on, so the planner falls back to
  * BroadcastNestedLoopJoin (or a cartesian product): O(|L|·|R|) and the
  * canonical accidental scale-killer, written naturally by anyone joining
  * "events to windows". This rule rewrites the logical join to:
  *
  *  - interval side: filter `end > start`, explode the covered time bins;
  *  - point side: project the single bin of `ts`;
  *  - inner join on `bin_l = bin_r` AND the ORIGINAL condition.
  *
  * Every original predicate is retained, so results are identical: bins
  * only over-approximate the candidate set (a true match always shares a
  * bin) and the original bounds discard the rest. A rewritten join carries
  * an equi-conjunct, so the rule never matches its own output.
  *
  * Bin width comes from `spark.graft.rangeJoin.binSeconds` (default 3600);
  * pick it near the typical interval span. Joins with any equi-conjunct
  * are left alone — Spark already plans those as hash/sort-merge joins
  * with the range bounds as post-join filters. Timestamps are assumed
  * >= epoch (integral division truncates toward zero).
  */
case class RangeJoinRewrite(binSeconds: () => Long)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def binOf(ts: Expression, w: Long): Expression =
    IntegralDivide(UnixMicros(ts), Literal(w * 1000000L))

  /** (point side ts, interval side (start, adjustedEnd)) if `conjuncts`
    * contains a full range pattern between the two join children. */
  private def rangePattern(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val lOut = left.outputSet
    val rOut = right.outputSet
    def sideOf(e: Expression): Option[Boolean] = // true = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(lOut)) Some(true)
      else if (e.references.subsetOf(rOut)) Some(false) else None
    def tsTyped(e: Expression) = e.dataType == TimestampType && e.deterministic

    // lower bounds as (ts, start); upper bounds as (ts, end, strict)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(t, s) => (t, s)
      case LessThanOrEqual(s, t) => (t, s)
    }
    val uppers = conjuncts.collect {
      case LessThan(t, e) => (t, e, true)
      case GreaterThan(e, t) => (t, e, false) // t < e strict, swapped form
      case LessThanOrEqual(t, e) => (t, e, false)
      case GreaterThanOrEqual(e, t) => (t, e, false)
    }
    (for {
      (t1, s) <- lowers if tsTyped(t1) && tsTyped(s)
      (t2, e, strict) <- uppers if t2.semanticEquals(t1) && tsTyped(e)
      tSide <- sideOf(t1)
      sSide <- sideOf(s) if sSide != tSide
      eSide <- sideOf(e) if eSide != tSide
    } yield (t1, s, e, strict)).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if cond.deterministic =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          val lOut = left.outputSet
          val rOut = right.outputSet
          (a.references.nonEmpty && b.references.nonEmpty) &&
            ((a.references.subsetOf(lOut) && b.references.subsetOf(rOut)) ||
              (a.references.subsetOf(rOut) && b.references.subsetOf(lOut)))
        case _ => false
      }
      // optimizer rules must not throw and must not emit a div-by-zero or
      // overflowed bin divisor: an unusable binSeconds conf leaves the join
      // unrewritten. Read lazily — equi joins (the common case) skip it.
      lazy val w = try binSeconds() catch { case _: NumberFormatException => -1L }
      if (hasEqui) j
      else rangePattern(conjuncts, left, right) match {
        case None => j
        case Some(_) if w <= 0 || w > Long.MaxValue / 1000000L => j
        case Some((ts, start, end, strictEnd)) =>
          val tsOnLeft = ts.references.subsetOf(left.outputSet)
          val (pointPlan, intervalPlan) = if (tsOnLeft) (left, right) else (right, left)

          // point side: one bin per row
          val binP = Alias(binOf(ts, w), "__graft_bin_p")()
          val pointB = Project(pointPlan.output :+ binP, pointPlan)

          // interval side: explode covered bins [start, end) / [start, end]
          val endMicros = if (strictEnd)
            Subtract(UnixMicros(end), Literal(1L)) else UnixMicros(end)
          // Sequence is TimeZoneAware: post-analysis rules must set the zone
          // themselves or the plan flips back to unresolved
          val seq = Sequence(
            IntegralDivide(UnixMicros(start), Literal(w * 1000000L)),
            IntegralDivide(endMicros, Literal(w * 1000000L)),
            Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
          val binI = AttributeReference("__graft_bin_i", LongType)()
          val nonEmpty = if (strictEnd) GreaterThan(end, start)
            else GreaterThanOrEqual(end, start)
          val intervalB = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(binI),
            Filter(nonEmpty, intervalPlan))

          val (newL, newR) = if (tsOnLeft) (pointB, intervalB) else (intervalB, pointB)
          val newCond = And(EqualTo(binP.toAttribute, binI), cond)
          Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
      }
  }
}
