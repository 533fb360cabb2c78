package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, CurrentRow, Expression, Literal, NamedExpression,
  NullsFirst, RangeFrame, RowFrame, RowOrdering, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Auto-rewrite for the GLOBAL `ROWS BETWEEN n PRECEDING AND m FOLLOWING`
  * sliding aggregate with a FOLLOWING end — the one ROWS family the
  * [[GlobalRankExec]] ring cannot emit at arrival (the frame needs values
  * that have not arrived yet). The identity that closes it: a ROWS frame
  * over a total order IS a RANGE frame over `row_number()` — row numbers
  * are dense unique BIGINTs, so `ROWS [n, m]` ≡
  * `RANGE BETWEEN n PRECEDING AND m FOLLOWING` over `ORDER BY rn`.
  *
  * The rewrite therefore only RE-EXPRESSES the plan and lets the existing
  * machinery distribute it on the same fixed-point batch:
  *
  *  1. one `row_number()` window over the original order —
  *     [[GlobalRankRule]] food (O(1)-state rank stream, range exchange);
  *  2. the original aggregates re-framed onto `RANGE (−n, +m) ORDER BY
  *     rn` — [[RangeSlidingRule]] (sum/count/decimal-avg, two ghost
  *     families) and/or [[RangeMinMaxRule]] (min/max block decomposition;
  *     its mixed-node split covers nodes carrying both families) food;
  *  3. a final Project restores the node's exact output.
  *
  * Downstream acceptance is checked BEFORE rewriting (the aggregate
  * families and the frame-length bound), so a plan is never stranded
  * half-rewritten with an extra rank window.
  *
  * Scope: global window, any deterministic ASC NULLS FIRST order (multi-
  * column orders are fine — rn linearizes them; the downstream rules get
  * the BIGINT key they need), literal bounds with `m ≥ 1` (`m = 0`
  * already rides the in-exec retract/deque lanes). Ties in the order key
  * make any ROWS frame nondeterministic (stock Spark picks an arbitrary
  * tie order; so does the synthesized rn) — the SQL-standard caveat,
  * unchanged by this rewrite; use a total order for deterministic
  * results, as ever.
  *
  * RowsFollowingSpec pins bit-equality vs the kill-switched stock Window
  * (sums, extrema, the mixed node, multi-column orders);
  * `e23_rows_centered_sql` pins the raw-SQL face — all five aggregate
  * families in ONE window — against DuckDB's native ROWS engine.
  */
object RowsFollowingRule extends Rule[LogicalPlan] {

  /** Kill-switch, the [[GlobalRankRule.EnabledKey]] idiom. */
  val EnabledKey = "spark.graft.rowsFollowing.enabled"

  private def bounds(lower: Expression, upper: Expression): Option[(Long, Long)] = {
    val n: Option[Long] = lower match {
      case Literal(v: Long, LongType) if v <= 0L && v > Long.MinValue + 1 => Some(-v)
      case Literal(v: Int, IntegerType) if v <= 0 => Some(-v.toLong)
      case CurrentRow => Some(0L)
      case _ => None
    }
    val m: Option[Long] = upper match {
      case Literal(v: Long, LongType) if v >= 1L => Some(v)
      case Literal(v: Int, IntegerType) if v >= 1 => Some(v.toLong)
      case _ => None
    }
    for (a <- n; b <- m) yield (a, b)
  }

  private def slotOf(ne: NamedExpression): Option[(Alias, (Long, Long))] =
    ne match {
      case a @ Alias(WindowExpression(AggregateExpression(_, _, false, None, _),
          WindowSpecDefinition(Nil, _,
            SpecifiedWindowFrame(RowFrame, lower, upper))), _) =>
        bounds(lower, upper).map(b => (a, b))
      case _ => None
    }

  /** Will the downstream RANGE rules accept the whole re-framed node?
    * Min/Max go to the block decomposition (any orderable type); the rest
    * must be [[RangeSlidingRule]] food. Mixed nodes are fine — the minmax
    * split peels them apart.
    */
  private def downstreamAccepts(
      exprs: Seq[NamedExpression], n: Long, m: Long): Boolean = {
    if (n >= Long.MaxValue - m) return false // block length must fit
    exprs.forall {
      case Alias(WindowExpression(
          AggregateExpression(af, _, false, None, _), _), _) =>
        af match {
          case Min(e) => e.deterministic && RowOrdering.isOrderable(e.dataType)
          case Max(e) => e.deterministic && RowOrdering.isOrderable(e.dataType)
          case _ => RangeSlidingRule.kindOf(af).isDefined
        }
      case _ => false
    }
  }

  /** Whole-node acceptance for OTHER rules (the [[DescOrderRule]]
    * canonicalization): every expression a bounded ROWS-FOLLOWING slot
    * over one shared frame the downstream RANGE rules will take.
    * Order-spec conditions are checked by the caller/apply.
    */
  private[plans] def acceptsExpressions(exprs: Seq[NamedExpression]): Boolean = {
    val slots = exprs.map(slotOf)
    exprs.nonEmpty && slots.forall(_.isDefined) &&
      slots.flatten.map(_._2).distinct.length == 1 && {
        val (n, m) = slots.flatten.head._2
        downstreamAccepts(exprs, n, m)
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w: Window
        if conf.getConfString(EnabledKey, "true") != "false" &&
          w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.orderSpec.forall(o => o.direction == Ascending &&
            o.nullOrdering == NullsFirst && o.child.deterministic) &&
          w.windowExpressions.nonEmpty && !PlanChecks.bounded(w.child) &&
          acceptsExpressions(w.windowExpressions) =>
      rewrite(w)
  }

  private[plans] def rewrite(w: Window): LogicalPlan = {
    val slots = w.windowExpressions.map(ne => slotOf(ne).get)
    val (n, m) = slots.head._2
    // 1. the dense BIGINT linearization of the original order: a running
    // COUNT(*) over ROWS UNBOUNDED PRECEDING..CURRENT ROW — value-equal
    // to row_number() but NATIVELY LongType. RowNumber() is IntegerType
    // and wraps silently past 2^31 rows BEFORE any cast could widen it;
    // this rule specifically targets unbounded global inputs, where a
    // rewrite must not cap what stock Spark computes correctly. The
    // running count is the same [[GlobalRankRule]] food (prefix count
    // lane, O(1) state).
    val rnSpec = WindowSpecDefinition(Nil, w.orderSpec,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    val rnA = Alias(WindowExpression(
      AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
      rnSpec), "__rf_rn")()
    val rnl = Window(Seq(rnA), Nil, w.orderSpec, w.child)
    val rnRef = rnA.toAttribute
    // 2. the same aggregates over RANGE (−n, +m) ORDER BY rn, original ids
    val rangeSpec = WindowSpecDefinition(Nil,
      Seq(SortOrder(rnRef, Ascending)),
      SpecifiedWindowFrame(RangeFrame, Literal(-n), Literal(m)))
    val reframed = slots.map { case (a, _) =>
      val we = a.child.asInstanceOf[WindowExpression]
      Alias(WindowExpression(we.windowFunction, rangeSpec), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val aggWin = Window(reframed, Nil, rangeSpec.orderSpec, rnl)
    // 3. drop the rn helper, keep the node's exact output
    Project(w.output, aggWin)
  }
}
