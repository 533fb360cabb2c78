package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSet, DenseRank, Expression, GenericInternalRow,
  JoinedRow, Lag, Lead, Literal, NamedExpression, NTile, PercentRank, Rank,
  RowNumber, RowOrdering, SortOrder, UnsafeProjection, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.IntegerType

/** Which rank function a [[GlobalRankNode]] column computes.
  *
  * Two families:
  *  - POSITIONAL (`row_number`, `ntile`): the value is a pure function of
  *    the row's global ordinal (and the total count).
  *  - TIE-AWARE (`rank`, `dense_rank`, `percent_rank`): the value depends
  *    on order-key equality with PEERS, which a range partitioning can
  *    split across partition boundaries — the exec's stats job collects
  *    each partition's boundary keys and tie-run lengths so the driver can
  *    stitch cross-partition tie CHAINS (a run spanning any number of
  *    whole partitions) into exact global ranks.
  * Aggregate window functions and `cume_dist` (whose value needs the END
  * of the tie run — a FORWARD chain) are not rewritten; they stay with
  * the [[PlanChecks]] lint.
  */
sealed trait GlobalRankFunc
object GlobalRankFunc {
  case object RowNum extends GlobalRankFunc
  case class Tile(n: Int) extends GlobalRankFunc
  case object Rnk extends GlobalRankFunc
  case object DenseRnk extends GlobalRankFunc
  case object PctRank extends GlobalRankFunc
  /** Global time-series shift (`lag`/`lead` with a literal offset and
    * literal default, ignoreNulls=false): the SHIFT family. `inputIdx`
    * points into the node's `shiftInputs` field — the shifted expressions
    * live THERE, as first-class plan expressions, so attribute rewrites
    * and reference tracking see them (an Expression buried inside this
    * ADT would be invisible to `QueryPlan.expressions`). Lag reads `k`
    * rows back, lead `k` rows ahead; boundary values flow through the
    * stats job (each partition ships its first/last `k` input values) and
    * the driver stitches the cross-partition neighbor windows —
    * O(#partitions × k) traffic, which is why the rule bounds `k`.
    */
  case class Shift(inputIdx: Int, k: Int, default: Any, isLag: Boolean)
      extends GlobalRankFunc
}

/** OPTIMIZER-DRIVEN distributed global ranking: the auto-rewrite face of
  * [[graft.operators.Ranking]].
  *
  * `row_number() OVER (ORDER BY …)` / `ntile(k) OVER (ORDER BY …)` with no
  * PARTITION BY plans a SINGLE-PARTITION Window — every row of the corpus
  * funnels through one task, the hard scale cliff [[PlanChecks]] lints
  * against and `Ranking.globalRank/ntile` exist to avoid. But both of
  * those are opt-in: a raw-SQL user writing the natural global window
  * still falls off the cliff. [[GlobalRankRule]] closes that gap the way
  * [[RangeJoinBinningRule]] did for keyless range joins — the cliff shape
  * is rewritten in the optimizer, so the SQL text stays the standard SQL
  * everybody writes.
  *
  * The rewrite targets exactly the lint's definition of the cliff: empty
  * partition spec AND an input not provably bounded (rank-the-aggregate
  * shapes keep their stock Window — tiny inputs gain nothing and existing
  * plans stay byte-stable). Every window expression in the node must be a
  * supported rank function (`row_number`/`ntile(lit)`/`rank`/`dense_rank`/
  * `percent_rank`); one unsupported sibling vetoes the whole node (a
  * half-rewrite would need two global orderings).
  *
  * Physical shape ([[GlobalRankExec]]): declares
  * `OrderedDistribution(orderSpec)` + per-partition sort — exactly a
  * global SORT's exchange envelope (range-partition then sort, every
  * partition order-contiguous), so EnsureRequirements/AQE own the
  * exchange. The merge is then embarrassingly parallel: one stats job
  * over the SAME materialized shuffle (the exchange's dependency is
  * created once, so the sampled range bounds CANNOT drift between the
  * stats job and the output job — the rdd.id-seeded drift class the 10×
  * gate caught in round 7) yields per-partition offsets — plus, for the
  * tie-aware functions, each partition's boundary keys and tie-run
  * lengths, which the driver stitches into cross-partition tie CHAINS —
  * and each partition then streams its ranks with O(1) state. No
  * single-task stage anywhere; driver traffic is O(#partitions) longs
  * plus two boundary keys per partition. The stats pass re-reads the
  * shuffle and re-runs the partition sort (zipWithIndex's two-job shape;
  * see the doExecute comment for why that beats materializing the
  * sorted corpus) — still a constant factor, never a cliff.
  *
  * Semantics parity (spec-pinned): ordinals are identical to the stock
  * single-partition Window on any TOTAL order; on ties `row_number`
  * emits some valid permutation within the tie group (the stock Window's
  * own order is partition-arrival-dependent) while `rank`/`dense_rank`/
  * `percent_rank` are tie-EXACT (peers share one value, so they are
  * deterministic even on non-total orders, matching the stock Window
  * bit-for-bit). `ntile` follows the SQL-standard remainder rule — first
  * `n % k` tiles get one extra row — bit-identical to Spark's `NTile`
  * and to DuckDB's (c8b's cross-engine oracle). Output types match
  * Spark's own functions (INT; DOUBLE for percent_rank).
  */
case class GlobalRankNode(
    child: LogicalPlan,
    orderSpec: Seq[SortOrder],
    ranks: Seq[(Attribute, GlobalRankFunc)],
    shiftInputs: Seq[Expression] = Nil)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ ranks.map(_._1)
  override def producedAttributes: AttributeSet = AttributeSet(ranks.map(_._1))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Rewrites the cliff-shaped Window ([[PlanChecks.unboundedGlobalWindows]]'
  * exact definition) into [[GlobalRankNode]] when every window expression
  * is a supported rank function. Runs in the user batch, after
  * pruning/pushdown.
  */
object GlobalRankRule extends Rule[LogicalPlan] {

  /** Runtime kill-switch: registration (`ensureRegistered` / extensions)
    * is session-wide and permanent, so comparators that must measure
    * Spark's STOCK single-partition Window — twin gates, independence
    * checks — can disable the rewrite for one evaluation via
    * `spark.conf.set(EnabledKey, "false")` / try-finally, instead of the
    * per-site bounded-input idiom.
    */
  val EnabledKey = "spark.graft.globalRank.enabled"

  // intermediate: Left = positional/tie-aware func, Right = shift waiting
  // for its input-expression slot in the node's shiftInputs field
  private def funcOf(
      ne: NamedExpression): Option[(Alias, Either[GlobalRankFunc, (Expression, Int, Any, Boolean)])] =
    ne match {
      case a @ Alias(WindowExpression(RowNumber(), _), _) =>
        Some((a, Left(GlobalRankFunc.RowNum)))
      case a @ Alias(WindowExpression(NTile(Literal(n: Int, IntegerType)), _), _)
          if n > 0 =>
        Some((a, Left(GlobalRankFunc.Tile(n))))
      case a @ Alias(WindowExpression(_: Rank, _), _) =>
        Some((a, Left(GlobalRankFunc.Rnk)))
      case a @ Alias(WindowExpression(_: DenseRank, _), _) =>
        Some((a, Left(GlobalRankFunc.DenseRnk)))
      case a @ Alias(WindowExpression(_: PercentRank, _), _) =>
        Some((a, Left(GlobalRankFunc.PctRank)))
      // shift family: literal offset (bounded — boundary values travel
      // through the driver at O(#partitions × k)), literal default,
      // ignoreNulls=false only (ignoreNulls needs unbounded lookback),
      // DETERMINISTIC input only (the stats job and the output job each
      // evaluate it; a non-deterministic input would make boundary values
      // disagree with the rows' own evaluations)
      case a @ Alias(WindowExpression(
          Lag(in, Literal(k: Int, IntegerType), d: Literal, false), _), _)
          if k >= 0 && k <= MaxShift && in.deterministic =>
        Some((a, Right((in, k, d.value, true))))
      case a @ Alias(WindowExpression(
          Lead(in, Literal(k: Int, IntegerType), d: Literal, false), _), _)
          if k >= 0 && k <= MaxShift && in.deterministic =>
        // k == 0 normalizes to the lag side: a zero shift is the current
        // row's value, which the arrival path computes (a lead slot is
        // only filled at pop, and a lead-0-only node never enters the
        // delay-line path at all)
        Some((a, Right((in, k, d.value, k == 0))))
      case _ => None
    }

  /** Shift offsets above this stay on the stock plan: each partition ships
    * `k` boundary values through the driver, so the bound keeps that
    * traffic at O(#partitions × 1024) worst case.
    */
  val MaxShift = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w: Window
        if conf.getConfString(EnabledKey, "true") != "false" &&
          w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.nonEmpty &&
          w.windowExpressions.forall(funcOf(_).isDefined) &&
          !PlanChecks.bounded(w.child) =>
      val inputs = scala.collection.mutable.ArrayBuffer.empty[Expression]
      val ranks = w.windowExpressions.map { ne =>
        funcOf(ne).get match {
          // SAME exprIds — upstream references stay valid
          case (a, Left(f)) => (a.toAttribute, f)
          case (a, Right((in, k, d, isLag))) =>
            val idx = inputs.indexWhere(_.semanticEquals(in)) match {
              case -1 => inputs += in; inputs.length - 1
              case i => i
            }
            (a.toAttribute, GlobalRankFunc.Shift(idx, k, d, isLag))
        }
      }
      GlobalRankNode(w.child, w.orderSpec, ranks, inputs.toSeq)
  }
}

/** Plans [[GlobalRankNode]] → [[GlobalRankExec]]. */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(child, order, ranks, shiftInputs) =>
      GlobalRankExec(order, ranks, planLater(child), shiftInputs) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(
    orderSpec: Seq[SortOrder],
    ranks: Seq[(Attribute, GlobalRankFunc)],
    child: SparkPlan,
    shiftInputs: Seq[Expression] = Nil)
    extends UnaryExecNode {

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] = child.output ++ ranks.map(_._1)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(orderSpec) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(orderSpec)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = orderSpec

  override protected def doExecute(): RDD[InternalRow] = {
    import GlobalRankExec.{PartCtx, PartStats}
    val numOutputRows = longMetric("numOutputRows")
    val childRDD = child.execute()
    val funcs = ranks.map(_._2).toArray
    val childOut = child.output
    val rankAttrs = ranks.map(_._1)
    val outAttrs = output
    val keyExprs = orderSpec.map(_.child)
    val keyTypes = keyExprs.map(_.dataType)
    // tie-aware functions need order-key equality across partition
    // boundaries; positional ones only need counts; shifts need boundary
    // VALUES of their input expressions
    val needKeys = funcs.exists {
      case GlobalRankFunc.RowNum | GlobalRankFunc.Tile(_) |
        GlobalRankFunc.Shift(_, _, _, _) => false
      case _ => true
    }
    val shiftFns = funcs.collect { case s: GlobalRankFunc.Shift => s }
    val hasShift = shiftFns.nonEmpty
    val maxK = if (hasShift) shiftFns.map(_.k).max else 0
    val maxLead = {
      val ls = shiftFns.filter(!_.isLag)
      if (ls.nonEmpty) ls.map(_.k).max else 0
    }
    val nInputs = shiftInputs.length
    val shiftIn = shiftInputs
    val shiftTypes = shiftInputs.map(_.dataType).toArray
    // Stats job over the SAME RDD object the output job maps: the range
    // exchange materializes its shuffle dependency exactly once, so both
    // jobs read identical partitions in identical order — the correctness
    // property (range bounds cannot drift between jobs). Cost honesty: the
    // shuffle WRITE happens once, but the reduce-side read AND the
    // per-partition SortExec above it run in BOTH jobs (RDDs are not
    // cached). That is the deliberate trade: persisting the sorted corpus
    // to make the stats pass free would materialize the entire input a
    // second time (storage ≥ the re-sort's CPU at corpus scale, plus
    // eviction pressure), and the tie-aware stats genuinely need the
    // sorted order for boundary keys/run lengths. Same shape as Spark's
    // own RDD.zipWithIndex (count job + output job over one lineage).
    val stats: Array[PartStats] = childRDD.mapPartitions({ it =>
      val keyProj = if (needKeys) UnsafeProjection.create(keyExprs, childOut) else null
      val ord = if (needKeys) RowOrdering.createNaturalAscendingOrdering(keyTypes) else null
      val collectVals = hasShift && maxK > 0
      val inProjs = if (collectVals)
        shiftIn.map(e => UnsafeProjection.create(Seq(e), childOut)).toArray else null
      val firsts = if (collectVals)
        Array.fill(nInputs)(scala.collection.mutable.ArrayBuffer.empty[InternalRow]) else null
      val lastRing = if (collectVals)
        Array.fill(nInputs)(new Array[InternalRow](maxK)) else null
      var n = 0L; var distinct = 0L; var runLen = 0L
      var firstKey: InternalRow = null; var prevKey: InternalRow = null
      while (it.hasNext) {
        val row = it.next()
        if (needKeys) {
          // copy only on run change (the projection reuses its buffer):
          // one allocation per distinct key, not per row. prevKey is then
          // SOME row of the trailing run — interchangeable for equality
          val k = keyProj(row)
          if (n == 0L) {
            firstKey = k.copy(); prevKey = firstKey; distinct = 1L; runLen = 1L
          } else if (ord.compare(k, prevKey) == 0) runLen += 1L
          else { prevKey = k.copy(); distinct += 1L; runLen = 1L }
        }
        if (collectVals) {
          var x = 0
          while (x < nInputs) {
            val v = inProjs(x)(row).copy()
            if (firsts(x).length < maxK) firsts(x) += v
            lastRing(x)((n % maxK).toInt) = v
            x += 1
          }
        }
        n += 1L
      }
      val firstArrs = if (collectVals) firsts.map(_.toArray) else null
      val lastArrs = if (collectVals) {
        val cnt = math.min(n, maxK.toLong).toInt
        Array.tabulate(nInputs)(x =>
          Array.tabulate(cnt)(j => lastRing(x)(((n - cnt + j) % maxK).toInt)))
      } else null
      Iterator.single(PartStats(n, firstKey, prevKey, runLen, distinct, firstArrs, lastArrs))
    }, preservesPartitioning = true).collect()
    val total = stats.map(_.n).sum
    // Driver chain-stitch (O(#partitions), boundary keys only): a tie run
    // can span any number of whole partitions; walking left to right with
    // (runKey, runStart, denseAcc) carries resolves every leading run to
    // the GLOBAL ordinal where its chain began, and every partition to the
    // count of distinct keys strictly before its first NEW key.
    val ctxs: Array[PartCtx] = locally {
      val out = Array.ofDim[PartCtx](stats.length)
      // driver-local ordering; NOT referenced inside the executor closure
      // below (BaseOrdering is not serializable)
      val dOrd =
        if (needKeys) RowOrdering.createNaturalAscendingOrdering(keyTypes) else null
      var off = 0L
      var runKey: InternalRow = null
      var runStart = 0L
      var denseAcc = 0L
      var i = 0
      while (i < stats.length) {
        val s = stats(i)
        if (s.n == 0L) out(i) = PartCtx(off, off, 0L)
        else if (!needKeys) { out(i) = PartCtx(off, off, 0L); off += s.n }
        else {
          val chained = runKey != null && dOrd.compare(runKey, s.firstKey) == 0
          out(i) = PartCtx(off,
            if (chained) runStart else off,
            denseAcc - (if (chained) 1L else 0L))
          if (!(chained && s.trailLen == s.n))
            runStart = off + s.n - s.trailLen
          runKey = s.lastKey
          denseAcc += s.distinct - (if (chained) 1L else 0L)
          off += s.n
        }
        i += 1
      }
      out
    }
    // Shift boundary stitching: for each partition, the maxK input values
    // immediately BEFORE it (ascending, possibly spanning several short
    // partitions) and immediately AFTER it — O(#partitions × maxK) driver
    // memory, bounded by the rule's MaxShift guard.
    val prevVals: Array[Array[Array[InternalRow]]] =
      if (hasShift && maxK > 0) locally {
        val out = Array.ofDim[Array[Array[InternalRow]]](stats.length)
        val ring = Array.fill(nInputs)(Vector.empty[InternalRow])
        var p = 0
        while (p < stats.length) {
          out(p) = Array.tabulate(nInputs)(x => ring(x).toArray)
          var x = 0
          while (x < nInputs) {
            ring(x) = (ring(x) ++ stats(p).lastVals(x)).takeRight(maxK); x += 1
          }
          p += 1
        }
        out
      } else null
    val nextVals: Array[Array[Array[InternalRow]]] =
      if (hasShift && maxK > 0) locally {
        val out = Array.ofDim[Array[Array[InternalRow]]](stats.length)
        val ring = Array.fill(nInputs)(Vector.empty[InternalRow])
        var p = stats.length - 1
        while (p >= 0) {
          out(p) = Array.tabulate(nInputs)(x => ring(x).toArray)
          var x = 0
          while (x < nInputs) {
            ring(x) = (stats(p).firstVals(x).toVector ++ ring(x)).take(maxK); x += 1
          }
          p -= 1
        }
        out
      } else null
    val partNs = stats.map(_.n)
    // ship the boundary-value tables via broadcast: a plain closure capture
    // would make EVERY task deserialize EVERY partition's values from its
    // task binary; the broadcast is fetched once per executor and each
    // task reads only its own pid slice
    val prevValsBc =
      if (prevVals != null) sparkContext.broadcast(prevVals) else null
    val nextValsBc =
      if (nextVals != null) sparkContext.broadcast(nextVals) else null
    childRDD.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outAttrs, childOut ++ rankAttrs)
      val joined = new JoinedRow
      val vals = new GenericInternalRow(funcs.length)
      val ctx = ctxs(pid)
      val n = partNs(pid)
      val keyProj = if (needKeys) UnsafeProjection.create(keyExprs, childOut) else null
      val ord = if (needKeys) RowOrdering.createNaturalAscendingOrdering(keyTypes) else null
      val inProjs = if (hasShift)
        shiftIn.map(e => UnsafeProjection.create(Seq(e), childOut)).toArray else null
      // value ring per input: positions [i - maxK, i] stay resolvable
      val ringSize = maxK + 1
      val valRing = if (hasShift)
        Array.fill(nInputs)(new Array[InternalRow](ringSize)) else null
      val pPrev = if (prevValsBc != null) prevValsBc.value(pid) else null
      val pNext = if (nextValsBc != null) nextValsBc.value(pid) else null
      var i = 0L // partition-local 0-based ordinal
      var prevKey: InternalRow = null
      var localRunStart = 0L
      var localDistinct = 0L

      // the input value at local position q, viewed from arrival `cur`:
      // ring for the in-window past, driver-stitched neighbors outside the
      // partition, null (→ default) beyond the corpus
      def valueAt(x: Int, q: Long, cur: Long): InternalRow =
        if (q >= 0 && q < n) {
          // q ∈ [cur - maxK, cur] by construction of every caller
          valRing(x)((q % ringSize).toInt)
        } else if (q < 0) {
          val arr = pPrev(x); val idx = arr.length + q
          if (idx >= 0) arr(idx.toInt) else null
        } else {
          val arr = pNext(x); val idx = (q - n).toInt
          if (idx < arr.length) arr(idx) else null
        }
      def shiftValue(f: GlobalRankFunc.Shift, q: Long, cur: Long): Any = {
        val r = valueAt(f.inputIdx, q, cur)
        if (r == null) f.default
        else if (r.isNullAt(0)) null
        else r.get(0, shiftTypes(f.inputIdx))
      }

      // arrival-time values: everything except lead slots (filled at pop).
      // Writes into a caller-provided array so the immediate path can
      // reuse ONE scratch array (no per-row allocation on the rank-only
      // hot path); the delay-line path passes a fresh array per row
      // because the values outlive the arrival.
      def arrivalValsInto(row: InternalRow, out: Array[Any]): Unit = {
        if (needKeys) {
          // copy only on run change, as in the stats pass
          val k = keyProj(row)
          if (i == 0L || ord.compare(k, prevKey) != 0) {
            localDistinct += 1L; localRunStart = i; prevKey = k.copy()
          }
        }
        if (hasShift) {
          var x = 0
          while (x < nInputs) {
            valRing(x)((i % ringSize).toInt) = inProjs(x)(row).copy(); x += 1
          }
        }
        val gIdx = ctx.offset + i
        // the leading run may CONTINUE a chain from earlier partitions:
        // its global start is ctx.leadStart (== ctx.offset when unchained)
        lazy val rankVal: Long =
          (if (localDistinct == 1L) ctx.leadStart
           else ctx.offset + localRunStart) + 1L
        var j = 0
        while (j < funcs.length) {
          funcs(j) match {
            case GlobalRankFunc.RowNum => out(j) = (gIdx + 1L).toInt
            case GlobalRankFunc.Tile(nt) => out(j) = GlobalRankExec.tileOf(gIdx, total, nt)
            case GlobalRankFunc.Rnk => out(j) = rankVal.toInt
            case GlobalRankFunc.DenseRnk => out(j) = (ctx.denseStart + localDistinct).toInt
            case GlobalRankFunc.PctRank =>
              out(j) = if (total <= 1L) 0.0 else (rankVal - 1L).toDouble / (total - 1L)
            case f @ GlobalRankFunc.Shift(_, k, _, true) =>
              out(j) = shiftValue(f, i - k, i)
            case GlobalRankFunc.Shift(_, _, _, false) => () // lead: at pop
          }
          j += 1
        }
        i += 1L
      }

      def emit(row: InternalRow, arr: Array[Any]): InternalRow = {
        var j = 0
        while (j < funcs.length) { vals.update(j, arr(j)); j += 1 }
        numOutputRows += 1
        proj(joined(row, vals))
      }

      if (maxLead == 0) {
        // immediate path: no emission delay, no child-row copies, ONE
        // reused scratch array (lead-0 normalized to the lag side by the
        // rule, so every slot fills at arrival)
        val scratch = new Array[Any](funcs.length)
        it.map { row => arrivalValsInto(row, scratch); emit(row, scratch) }
      } else {
        // delay-line path: a row emits once `maxLead` later rows have
        // arrived (its lead values are then in the ring) or at drain,
        // where positions past the partition resolve from the driver's
        // neighbor values. O(maxLead) buffered row copies.
        new Iterator[InternalRow] {
          private val queue =
            new java.util.ArrayDeque[(InternalRow, Array[Any], Long)]()
          private var out: InternalRow = null
          private def fillLead(arr: Array[Any], j: Long, cur: Long): Unit = {
            var s = 0
            while (s < funcs.length) {
              funcs(s) match {
                case f @ GlobalRankFunc.Shift(_, k, _, false) =>
                  arr(s) = shiftValue(f, j + k, cur)
                case _ => ()
              }
              s += 1
            }
          }
          private def advance(): Unit =
            while (out == null && (it.hasNext || !queue.isEmpty)) {
              if (it.hasNext) {
                val row = it.next()
                val localIdx = i // arrivalValsInto advances i
                val arr = new Array[Any](funcs.length)
                arrivalValsInto(row, arr)
                queue.addLast((row.copy(), arr, localIdx))
                if (queue.size > maxLead) {
                  val (r, a, j) = queue.removeFirst()
                  fillLead(a, j, localIdx)
                  out = emit(r, a)
                }
              } else {
                val (r, a, j) = queue.removeFirst()
                fillLead(a, j, n - 1L)
                out = emit(r, a)
              }
            }
          override def hasNext: Boolean = { advance(); out != null }
          override def next(): InternalRow = {
            advance()
            if (out == null) throw new NoSuchElementException("empty iterator")
            val r = out; out = null; r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object GlobalRankExec {
  /** Per-partition boundary stats from the first pass: row count, the
    * first/last order keys (UnsafeRow copies — serializable), the trailing
    * tie-run length (rows equal to `lastKey` at the tail), the distinct-key
    * count, and — when shift functions are present — each shift input's
    * first/last `maxK` values (outer index = shift-input slot).
    */
  case class PartStats(
      n: Long,
      firstKey: InternalRow,
      lastKey: InternalRow,
      trailLen: Long,
      distinct: Long,
      firstVals: Array[Array[InternalRow]] = null,
      lastVals: Array[Array[InternalRow]] = null)

  /** Driver-stitched per-partition context: the partition's global row
    * offset, the global ordinal where its LEADING tie run's chain began,
    * and the distinct-key base for dense_rank (chain-merged keys counted
    * once).
    */
  case class PartCtx(offset: Long, leadStart: Long, denseStart: Long)

  /** SQL-standard NTILE over the 0-based global ordinal: the first
    * `total % n` tiles carry `total/n + 1` rows, the rest `total/n` —
    * bit-identical to Spark's `NTile` and `Ranking.ntile`.
    */
  def tileOf(idx: Long, total: Long, n: Int): Int = {
    val bucketSize = total / n
    val rem = total % n
    val fat = bucketSize + 1
    val cut = rem * fat
    (if (idx < cut) idx / fat else rem + (idx - cut) / bucketSize).toInt + 1
  }
}

/** Session-scoped deployment (the [[AsOfJoin.ensureRegistered]] idiom;
  * idempotent), or cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GlobalRank {
  def ensureRegistered(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(GlobalRankRule))
      exp.extraOptimizations = exp.extraOptimizations :+ GlobalRankRule
    if (!exp.extraStrategies.contains(GlobalRankStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GlobalRankStrategy
  }
}
