package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Cast, Coalesce, EqualTo, Expression, If, IsNotNull,
  Literal, NamedExpression, NullsFirst, RangeFrame, RowFrame, SortOrder,
  SpecifiedWindowFrame, Subtract, UnboundedFollowing, UnboundedPreceding,
  CurrentRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Sum}
import org.apache.spark.sql.catalyst.expressions.{EvalMode, NumericEvalContext}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType,
  ByteType, ShortType}

/** Auto-rewrite for the raw-SQL GLOBAL `RANGE BETWEEN n PRECEDING AND
  * CURRENT ROW` sliding aggregate — the [[graft.operators.RangeWindows]]
  * ghost-probe composition, applied in the optimizer so the natural SQL
  * everybody writes stops falling off the single-partition-Window cliff
  * (the [[GlobalRankRule]] mission, extended to the one sliding family its
  * in-exec ring cannot carry: a VALUE-bounded frame reaches back an
  * unbounded ROW count across partition boundaries).
  *
  * Rewrite, join-free (an optimizer rule cannot lean on the Dataset API's
  * self-join attribute deduplication):
  *
  *  1. UNION the input with one NULL-valued GHOST row per distinct
  *     non-null order key, sorted at the frame's exclusive threshold
  *     `k − n − 1` and remembering the key it serves;
  *  2. ONE global running aggregate over `(sortKey, isGhost)` — rewritten
  *     by [[GlobalRankRule]] on the same fixed-point batch into the
  *     distributed [[GlobalRankExec]] — gives reals their peer-inclusive
  *     prefix and ghosts the threshold prefix (every aggregate input is
  *     guarded `IF(isGhost, NULL, e)`, so ghosts contribute nothing —
  *     `count(*)`'s literal included);
  *  3. a PARTITIONED window keyed by `coalesce(servedKey, sortKey)` —
  *     a plain hash-exchange WindowExec, no cliff — delivers each ghost's
  *     threshold prefix to exactly the rows it serves (the ghost lands in
  *     its served key's partition because that is what it remembers);
  *  4. the frame value is the exact difference, a count lane deciding the
  *     SQL all-null-frame NULL; output aliases keep the original exprIds
  *     so downstream references resolve untouched.
  *
  * Scope (one unsupported sibling vetoes the node, the GlobalRankRule
  * doctrine): single `ORDER BY k ASC NULLS FIRST` with a deterministic
  * BIGINT key; every window expression a legacy-mode `SUM` (decimal or
  * integral — subtraction is exact: decimal prefixes are exact, long
  * prefixes wrap mod 2^64 and the wrapped difference equals the wrapped
  * frame sum) or `COUNT`, all over one shared literal width. Integral ANSI
  * sums stay stock (their exactness rests on wrap-around difference
  * algebra; a checked running prefix would throw where every stock frame
  * sum fits); decimal sums ride in both modes — decimal(p+10, s) already
  * gives the running prefix ten digits of headroom, and past it the
  * STOCK frame sum's own result type overflows identically; float/double
  * sums stay stock (prefix cancellation); min/max have no inverse. Null keys get exact SQL semantics: their frame is their null
  * peer group — no ghost, nothing subtracted.
  *
  * Corpus contract carried from the running-total family (e15): the
  * corpus-wide prefix must fit the sum's result type — decimal(p+10, s)
  * gives ten digits of headroom, the same contract any running total
  * already lives with.
  *
  * RangeSlidingRuleSpec pins bit-equality vs the kill-switched stock
  * Window on randomized tied/null corpora and the scope rejections;
  * `e19b_range_sliding_sql` pins the raw-SQL face against DuckDB's
  * native RANGE window engine.
  */
object RangeSlidingRule extends Rule[LogicalPlan] {

  /** Kill-switch, the [[GlobalRankRule.EnabledKey]] idiom. */
  val EnabledKey = "spark.graft.rangeSliding.enabled"

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  /** (alias, aggregate input, Some(sum eval context) | None = count,
    * frame width) for a supported slot.
    */
  private def slotOf(ne: NamedExpression): Option[(Alias, Expression, Option[NumericEvalContext], Long)] =
    ne match {
      case a @ Alias(WindowExpression(
          AggregateExpression(af, _, false, None, _),
          WindowSpecDefinition(Nil, _,
            SpecifiedWindowFrame(RangeFrame, lower, CurrentRow))), _) =>
        val width: Option[Long] = lower match {
          case Literal(v: Long, LongType) if v <= 0L => Some(-v)
          case Literal(v: Int, IntegerType) if v <= 0 => Some(-v.toLong)
          case _ => None
        }
        width.flatMap { n =>
          af match {
            // decimal sums ride in BOTH eval modes: the exact subtraction
            // and the overflow contract match the stock frame sum up to the
            // corpus-prefix headroom (see the class doc). Integral sums are
            // LEGACY-only: their exactness rests on wrap-around difference
            // algebra, and an ANSI checked prefix would throw on running
            // overflow where every stock frame sum fits.
            case Sum(e, ctx) if e.deterministic && ctx.evalMode != EvalMode.TRY &&
                (e.dataType.isInstanceOf[DecimalType] ||
                  (integral(e.dataType) && ctx.evalMode == EvalMode.LEGACY)) =>
              Some((a, e, Some(ctx), n))
            case Count(Seq(e)) if e.deterministic => Some((a, e, None, n))
            case _ => None
          }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w: Window
        if conf.getConfString(EnabledKey, "true") != "false" &&
          w.partitionSpec.isEmpty && w.orderSpec.length == 1 &&
          w.orderSpec.head.direction == Ascending &&
          w.orderSpec.head.nullOrdering == NullsFirst &&
          w.orderSpec.head.child.dataType == LongType &&
          w.orderSpec.head.child.deterministic &&
          w.windowExpressions.nonEmpty &&
          !PlanChecks.bounded(w.child) && {
            val slots = w.windowExpressions.map(slotOf)
            slots.forall(_.isDefined) &&
              slots.flatten.map(_._4).distinct.length == 1
          } =>
      rewrite(w)
  }

  private def rewrite(w: Window): LogicalPlan = {
    val k = w.orderSpec.head.child
    val slots = w.windowExpressions.map(ne => slotOf(ne).get)
    val width = slots.head._4
    val child = w.child

    // rows ∪ one ghost per distinct non-null key
    val sortA = Alias(k, "__rw_sort")()
    val forNullA = Alias(Literal(null, LongType), "__rw_for")()
    val gZeroA = Alias(Literal(0), "__rw_g")()
    val reals = Project(child.output ++ Seq(sortA, forNullA, gZeroA), child)
    val keyA = Alias(k, "__rw_key")()
    val keyed = Project(Seq(keyA), Filter(IsNotNull(k), child))
    val kAttr = keyA.toAttribute
    val distinctKeys = Aggregate(Seq(kAttr), Seq(kAttr), keyed)
    val ghosts = Project(
      child.output.map(a => Alias(Literal(null, a.dataType), a.name)()) ++ Seq(
        Alias(Subtract(kAttr, Literal(width + 1L)), "__rw_sort")(),
        Alias(kAttr, "__rw_for")(),
        Alias(Literal(1), "__rw_g")()),
      distinctKeys)
    val union = Union(Seq(reals, ghosts))
    val sortRef = sortA.toAttribute
    val forRef = forNullA.toAttribute
    val gRef = gZeroA.toAttribute

    // one global running window (GlobalRankRule's food) with guarded inputs
    val runSpec = WindowSpecDefinition(Nil,
      Seq(SortOrder(sortRef, Ascending), SortOrder(gRef, Ascending)),
      SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow))
    def guarded(e: Expression): Expression =
      If(EqualTo(gRef, Literal(1)), Literal(null, e.dataType), e)
    val sLanes: Seq[Option[Alias]] = slots.zipWithIndex.map {
      case ((_, e, ctxOpt, _), j) =>
        ctxOpt.map(ctx => Alias(WindowExpression(
          AggregateExpression(Sum(guarded(e), ctx), Complete, isDistinct = false),
          runSpec), s"__rw_s$j")())
    }
    val cLanes: Seq[Alias] = slots.zipWithIndex.map { case ((_, e, _, _), j) =>
      Alias(WindowExpression(
        AggregateExpression(Count(Seq(guarded(e))), Complete, isDistinct = false),
        runSpec), s"__rw_c$j")()
    }
    val runWin = Window(sLanes.flatten ++ cLanes, Nil, runSpec.orderSpec, union)

    // threshold delivery: a PARTITIONED window keyed by the served key —
    // the ghost remembers it, the reals ARE it
    val k2A = Alias(Coalesce(Seq(forRef, sortRef)), "__rw_k2")()
    val withK2 = Project(runWin.output ++ Seq(k2A), runWin)
    val k2Ref = k2A.toAttribute
    val partSpec = WindowSpecDefinition(Seq(k2Ref), Nil,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))
    def ghostOnly(e: Expression): Expression =
      If(EqualTo(gRef, Literal(1)), e, Literal(null, e.dataType))
    val tsLanes: Seq[Option[Alias]] = sLanes.zipWithIndex.map {
      case (Some(s), j) => Some(Alias(WindowExpression(
        AggregateExpression(Max(ghostOnly(s.toAttribute)),
          Complete, isDistinct = false),
        partSpec), s"__rw_ts$j")())
      case (None, _) => None
    }
    val tcLanes: Seq[Alias] = cLanes.zipWithIndex.map { case (c, j) =>
      Alias(WindowExpression(
        AggregateExpression(Max(ghostOnly(c.toAttribute)),
          Complete, isDistinct = false),
        partSpec), s"__rw_tc$j")()
    }
    val deliverWin = Window(tsLanes.flatten ++ tcLanes,
      Seq(k2Ref), Nil, withK2)

    // drop the ghosts, emit the exact differences under the ORIGINAL ids
    val realRows = Filter(EqualTo(gRef, Literal(0)), deliverWin)
    val outAggs: Seq[NamedExpression] = slots.zipWithIndex.map {
      case ((a, _, ctxOpt, _), j) =>
        val cRef = cLanes(j).toAttribute
        val tcRef = tcLanes(j).toAttribute
        val frameCnt = Subtract(cRef, Coalesce(Seq(tcRef, Literal(0L))))
        val value: Expression =
          if (ctxOpt.isEmpty) frameCnt
          else {
            val sRef = sLanes(j).get.toAttribute
            val tsRef = tsLanes(j).get.toAttribute
            val resT = a.child.dataType
            val diff = Subtract(sRef, Coalesce(Seq(tsRef, Cast(Literal(0L), sRef.dataType))))
            val sized = if (diff.dataType == resT) diff else Cast(diff, resT)
            If(EqualTo(frameCnt, Literal(0L)), Literal(null, resT), sized)
          }
        Alias(value, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    Project(child.output ++ outAggs, realRows)
  }
}
