package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, CurrentRow, Descending, NamedExpression, NullsFirst,
  NullsLast, SortOrder, SpecifiedWindowFrame, UnboundedFollowing,
  UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Count, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

/** Auto-rewrite for GLOBAL SUFFIX frames — `OVER (ORDER BY k [ROWS|RANGE]
  * BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)`, the "remaining total" /
  * "final value from here on" SQL — by ORDER REVERSAL: a suffix frame
  * over an order is exactly a RUNNING PREFIX frame over the REVERSED
  * order (same row set per row; for RANGE, the peer groups are identical
  * and a peer-inclusive prefix over the reverse is the peer-inclusive
  * suffix over the original — null groups included, since flipping both
  * direction and null ordering keeps every group's relative side). The
  * reversed node is then [[GlobalRankRule]] food on the same fixed-point
  * batch — its exec is direction-agnostic (arrival order + tie detection
  * by key equality, DescOrderSpec-pinned), so the reversed keys
  * distribute directly, ANY orderable type included.
  *
  * The stock plan is doubly pathological: the one-task cliff, AND
  * `UnboundedFollowingWindowFunctionFrame` RECOMPUTES the aggregate from
  * scratch for every row — O(n²) per partition (measured: ~1.5M rows did
  * not finish in an hour, where the rewrite answers in seconds). The
  * rewrite replaces quadratic single-threaded work with one distributed
  * O(n log n) pass.
  *
  * Function mapping under reversal: `first_value` ↔ `last_value` (the
  * frame's first row is the reversed frame's last); `sum`/`count`/`min`/
  * `max`/`avg` are row-set functions and carry over unchanged. Scope:
  * every window expression an aggregate over the one shared suffix
  * frame; fp (float/double) `SUM`/`AVG` stay stock — their value depends
  * on ADD ORDER, which reversal flips, so the rewrite could not be
  * bit-compatible with the stock plan (decimal/integral sums and any
  * min/max/count/first/last ride). Ties keep the SQL-standard ROWS
  * nondeterminism caveat. Acceptance — reversal, canonicalization, AND
  * the rank family taking every mapped expression — is checked BEFORE
  * rewriting, so no plan is churned-but-stranded.
  *
  * SuffixFrameSpec pins bit-equality vs the kill-switched stock Window
  * (ROWS + RANGE suffixes, nulls, ties, first/last mapping, DESC
  * originals reversing to plain ASC); `e25_suffix_frames_sql` pins the
  * raw-SQL face against DuckDB's native window engine.
  */
object SuffixFrameRule extends Rule[LogicalPlan] {

  /** Kill-switch, the [[GlobalRankRule.EnabledKey]] idiom. */
  val EnabledKey = "spark.graft.suffixFrame.enabled"

  private def fp(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.FloatType ||
      dt == org.apache.spark.sql.types.DoubleType

  /** The reversed-order twin of one suffix-frame expression, or None when
    * the expression is out of scope.
    */
  private def mapped(ne: NamedExpression): Option[Alias] = ne match {
    case a @ Alias(WindowExpression(
        ae @ AggregateExpression(af, _, false, None, _),
        WindowSpecDefinition(Nil, order,
          SpecifiedWindowFrame(ft, CurrentRow, UnboundedFollowing))), _) =>
      val prefixFrame = SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow)
      val spec = WindowSpecDefinition(Nil, order.map(reverse), prefixFrame)
      val mappedAf = af match {
        // fp SUM: add order reverses with the frame — stays stock
        case Sum(e, _) if fp(e.dataType) => None
        case s: Sum => Some(s)
        case c: Count => Some(c)
        case m: Min => Some(m)
        case m: Max => Some(m)
        // AVG accumulates its sum in a DOUBLE buffer for every non-decimal
        // input — INTEGRAL included (Average.sumDataType is DoubleType
        // unless the input is DecimalType) — so add order, which reversal
        // flips, can reach the last ulp once the running sum passes 2^53;
        // only DECIMAL avg is order-independent and rides
        case av @ Average(e, _) if e.dataType.isInstanceOf[DecimalType] =>
          Some(av)
        case _: Average => None
        case First(e, ign) => Some(Last(e, ign))
        case Last(e, ign) => Some(First(e, ign))
        case _ => None
      }
      mappedAf.map { f =>
        Alias(WindowExpression(ae.copy(aggregateFunction = f), spec), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
    case _ => None
  }

  private def reverse(o: SortOrder): SortOrder = {
    val dir = if (o.direction == Ascending) Descending else Ascending
    val no = if (o.nullOrdering == NullsFirst) NullsLast else NullsFirst
    SortOrder(o.child, dir, no, Seq.empty)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w: Window
        if conf.getConfString(EnabledKey, "true") != "false" &&
          w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty && !PlanChecks.bounded(w.child) =>
      // the rewrite runs ONCE per matched node per fixed-point pass;
      // returning the untouched node on a reject leaves the plan unchanged
      // (same instance), so the executor still reaches its fixed point
      rewritten(w).getOrElse(w)
  }

  private def rewritten(w: Window): Option[LogicalPlan] = {
    val exprs = w.windowExpressions.map(mapped)
    if (exprs.exists(_.isEmpty)) return None
    if (!w.orderSpec.forall(_.child.deterministic)) return None
    val newOrder = w.orderSpec.map(reverse)
    val w2 = Window(exprs.flatten, Nil, newOrder, w.child)
    // the reversed node must keep distributing: every mapped expression
    // rank-family food (the family takes any deterministic order)
    if (!GlobalRankRule.acceptsExpressions(w2.windowExpressions)) return None
    Some(Project(w.output, w2))
  }
}
