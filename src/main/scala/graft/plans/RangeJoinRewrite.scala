package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite a time-band (range) join — an inner join whose
  * condition bounds one side's timestamp between two expressions of the
  * other side (`P >= lo AND P < hi`, any comparison strictness, any
  * argument order, plus any number of ordinary equi conjuncts) — into the
  * grid-bucketed equi-join shape of
  * [[graft.operators.Scale.intervalJoin]].
  *
  * Without an equi key Spark plans such a join as a (broadcast) nested
  * loop — O(|probe| × |intervals|) comparisons, the 100 TB scale-killer.
  * The rewrite explodes the INTERVAL side into the fixed-width time cells
  * its [lo, hi] span overlaps, maps the point side to its single cell, and
  * joins on cell equality (plus the original equi keys); the original
  * range conjuncts are re-applied as a filter above the join, so the
  * result is identical — each true pair is produced exactly once (a point
  * has exactly one cell). Rows with per-row inverted or null bounds
  * contribute no matches either way (the re-applied filter rejects any
  * spurious cell-mates). Users write the naive formulation; the engine
  * plans the scalable one.
  *
  * Safety guards:
  *   - inner joins only, both sides batch (stream-stream range joins MUST
  *     keep the raw band condition — it is what drives watermark state
  *     eviction in StreamingSymmetricHashJoin);
  *   - point and bound expressions are deterministic TimestampType and
  *     reference exactly one (opposite) side each — comparisons against
  *     literals/constants never match;
  *   - skips joins already carrying a `__cell`/`__range_cell` key (the
  *     explicit operator's output, or this rule's own — the rule runs in
  *     a fixed-point batch and must not re-fire on its result);
  *   - interval rows spanning >= `spark.graft.rangeJoin.maxCellsPerRow`
  *     grid cells (default 10000) are diverted to a fallback band join
  *     (rare pathological rows only) instead of exploding — an unbounded
  *     Sequence would hit the array-length limit / OOM where the naive
  *     plan merely ran slow.
  *
  * Grid width: `spark.graft.rangeJoin.gridSeconds` (default 3600); set it
  * near the typical interval length — see the operator's Scaladoc for the
  * explode-factor / candidate-precision trade. Disable with
  * `spark.graft.rangeJoin.enabled=false`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private[plans] val CellName = "__range_cell"

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def gridUs: Long =
    conf.getConfString("spark.graft.rangeJoin.gridSeconds", "3600").toLong *
      1000000L
  private def maxCells: Long =
    conf.getConfString("spark.graft.rangeJoin.maxCellsPerRow", "10000").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
        rewrite(left, right, cond, hint).getOrElse(j)
    }
  }

  private def sideOnly(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.references.nonEmpty &&
      e.references.subsetOf(side.outputSet)

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.exists(_.references.exists(a =>
        a.name == CellName || a.name == "__cell"))) return None

    // normalize each timestamp comparison between opposite sides to
    // (small, large) meaning small <= large (strictness lives on in the
    // re-applied original conjunct)
    val bounds = conjuncts.flatMap { c =>
      val pair = c match {
        case LessThan(a, b)           => Some((a, b))
        case LessThanOrEqual(a, b)    => Some((a, b))
        case GreaterThan(a, b)        => Some((b, a))
        case GreaterThanOrEqual(a, b) => Some((b, a))
        case _ => None
      }
      pair.collect {
        case (small, large)
            if small.dataType == TimestampType &&
              large.dataType == TimestampType &&
              ((sideOnly(small, left) && sideOnly(large, right)) ||
               (sideOnly(small, right) && sideOnly(large, left))) =>
          (small, large, c)
      }
    }

    // a band = some point expression P bounded above in one conjunct
    // (P = small of c1) and below in another (P = large of c2)
    val band = (for {
      (s1, l1, c1) <- bounds.iterator
      (s2, l2, c2) <- bounds.iterator if c1 ne c2
      if s1.semanticEquals(l2)
    } yield (s1, s2, l1, c1, c2)).nextOption()

    band.flatMap { case (point, lower, upper, bandC1, bandC2) =>
      val pointOnLeft = sideOnly(point, left)
      val pointChild = if (pointOnLeft) left else right
      val explodeChild = if (pointOnLeft) right else left
      if (!sideOnly(lower, explodeChild) || !sideOnly(upper, explodeChild)) {
        None // bounds from mixed sides: not a band join
      } else {
        val g = Literal(gridUs)
        def cellOf(e: Expression): Expression =
          IntegralDivide(UnixMicros(e), g)
        val cellAttr =
          AttributeReference(CellName, LongType, nullable = false)()
        // Sequence is TimeZoneAware: the analyzer's ResolveTimeZone has
        // already run, so the id must be supplied here or the plan
        // de-resolves. Guard inverted per-row bounds: sequence(a, b)
        // counts DOWN when a > b — a single corrupt interval row would
        // fabricate a huge descending cell list where the un-rewritten
        // plan just matches nothing; emit an empty cell array instead.
        val loCell = cellOf(lower)
        val hiCell = cellOf(upper)
        val cells = If(LessThanOrEqual(loCell, hiCell),
          new Sequence(loCell, hiCell, None,
            Some(conf.sessionLocalTimeZone)),
          Literal.create(Array.empty[Long],
            org.apache.spark.sql.types.ArrayType(LongType, false)))
        // Width guard: a valid but very wide band (bounds far apart
        // relative to the grid, e.g. a multi-year interval at the 3600 s
        // default) would materialize one row per cell per interval —
        // Sequence's array-length limit / OOM where the un-rewritten plan
        // merely ran slow. Interval rows spanning >= maxCellsPerRow cells
        // take a fallback band join instead (nested loop, but only over
        // those rare pathological rows); everything else takes the cell
        // equi-join. Null/inverted bounds land in the narrow branch and
        // explode to nothing, exactly as before.
        val wideCond = GreaterThanOrEqual(Subtract(hiCell, loCell),
          Literal(maxCells))
        val gen = Generate(
          Explode(cells),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(cellAttr),
          Filter(Not(wideCond), explodeChild))
        val pointCell = Alias(cellOf(point), CellName)()
        val proj = Project(pointChild.output :+ pointCell, pointChild)
        val equi = conjuncts.filter {
          case EqualTo(a, b) =>
            (sideOnly(a, left) && sideOnly(b, right)) ||
              (sideOnly(a, right) && sideOnly(b, left))
          case _ => false
        }
        val residual = conjuncts.filterNot(equi.contains)
        val cellEq = EqualTo(cellAttr, pointCell.toAttribute)
        val (newLeft, newRight) =
          if (pointOnLeft) (proj, gen) else (gen, proj)
        val joined =
          Join(newLeft, newRight, Inner, Some((equi :+ cellEq).reduce(And)),
            hint)
        val narrow = Project(left.output ++ right.output,
          Filter(residual.reduce(And), joined))
        // Fallback branch for the wide rows: the ORIGINAL join, with the
        // two band conjuncts recast onto unix_micros (same semantics —
        // the conversion is monotone and null-preserving) so this rule's
        // band matcher, which requires TimestampType comparisons, cannot
        // re-fire on its own fallback in the fixed-point batch.
        //
        // Cost note: the Union embeds both inputs twice, so the rewritten
        // plan reads each side a second time to find (usually zero) wide
        // rows — a logical-planning rule cannot know the wide-row count
        // up front, and scan reuse does not collapse the second read.
        // That extra pass is the price of never exploding a pathological
        // interval; pipelines that can PROVE bounded intervals should use
        // Scale.intervalJoin, whose fail-fast width guard keeps the
        // single-scan shape.
        def micros(c: Expression): Expression = c match {
          case LessThan(a, b) => LessThan(UnixMicros(a), UnixMicros(b))
          case LessThanOrEqual(a, b) =>
            LessThanOrEqual(UnixMicros(a), UnixMicros(b))
          case GreaterThan(a, b) => GreaterThan(UnixMicros(a), UnixMicros(b))
          case GreaterThanOrEqual(a, b) =>
            GreaterThanOrEqual(UnixMicros(a), UnixMicros(b))
          case other => other
        }
        val wideCond2 = conjuncts.map {
          case c if c eq bandC1 => micros(bandC1)
          case c if c eq bandC2 => micros(bandC2)
          case c => c
        }.reduce(And)
        val wideExplode = Filter(wideCond, explodeChild)
        val (wl, wr) =
          if (pointOnLeft) (pointChild, wideExplode)
          else (wideExplode, pointChild)
        val wide = Project(left.output ++ right.output,
          Join(wl, wr, Inner, Some(wideCond2), hint))
        Some(Union(Seq(narrow, wide)))
      }
    }
  }
}
