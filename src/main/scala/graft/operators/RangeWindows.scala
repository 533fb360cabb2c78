package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL `RANGE BETWEEN w PRECEDING AND CURRENT ROW`
  * aggregates — the one sliding-frame family [[graft.plans.GlobalRankRule]]
  * cannot rewrite in place (a VALUE-bounded frame can reach back an
  * unbounded ROW count across partition boundaries, so the exec's
  * O(#partitions × k) driver-stitched boundary lane cannot carry the
  * warm-up; the stock Spark plan is the single-partition Window cliff).
  *
  * The composition that stays distributed — the GHOST-PROBE subtraction.
  * The frame value at key k is `prefix(k, peer-inclusive) −
  * prefix(k − w − 1)`, and the subtrahend is a function of the KEY alone,
  * so ONE ghost row per DISTINCT key suffices:
  *
  *  1. every distinct non-null key k spawns a NULL-valued ghost at sort
  *     position `k − w − 1` (the frame's exclusive lower threshold,
  *     integral keys), remembering `k` as the key it serves;
  *  2. ONE running aggregate over rows ∪ ghosts, ordered by
  *     `(sortKey, isGhost)` with the SQL-default peer-inclusive RANGE
  *     frame — [[graft.plans.GlobalRankRule]] rewrites it to the
  *     distributed [[graft.plans.GlobalRankExec]] — gives REAL rows the
  *     prefix through their full peer run (the frame's inclusive top) and
  *     GHOSTS the prefix through every real row at key ≤ k − w − 1
  *     (ghosts sort AFTER the reals of their sort position and contribute
  *     nothing: sum/count ignore their null values);
  *  3. a LEFT equi-join ON THE KEY brings each threshold prefix back to
  *     the rows it serves; the frame value is the exact difference, with
  *     the companion count lane deciding the SQL all-null-frame NULL.
  *
  * NULL order keys (sorted FIRST, the ASC default this operator assumes)
  * get exactly the SQL semantics for free: a null-key row's frame is its
  * own null peer group, which IS its peer-inclusive prefix (nothing sorts
  * before the nulls), and no ghost is spawned for it — the left join
  * leaves the subtrahend absent and `coalesce` subtracts nothing.
  *
  * Cost shape: one range exchange over N + #distinct-keys rows (the
  * window) plus one hash join on the key — no single-task stage, no
  * value-dependent halo, no driver traffic beyond the exec's usual
  * O(#partitions). Join skew equals key-tie multiplicity, the same skew
  * the window's tie runs already carry. Exactness: the caller passes a
  * DECIMAL value column, so prefix sums are exact and the subtraction
  * introduces no error (the reason float/double inputs are rejected — a
  * running double prefix cancels catastrophically under subtraction, the
  * same veto the ROWS-sliding rewrite applies). Contract carried from the
  * e15 running-total family: the CORPUS-WIDE prefix sum must fit the
  * decimal sum type decimal(p+10, s) — any running-total query already
  * lives with this.
  *
  * Scope: `keyCol` long-backed (cast dates/timestamps to day numbers /
  * epoch micros first; values must stay above Long.MinValue + w + 1);
  * `valueCol` DECIMAL; sum/count/avg only — min/max have no inverse and
  * that residue stays on the PlanChecks lint.
  *
  * RangeWindowsSpec pins bit-equality against Spark's stock
  * single-partition `rangeBetween` Window on randomized tied/null
  * corpora; the `e19_range_sliding` gate row pins the semantics against
  * DuckDB's native RANGE window engine; the 10× twin gate re-pins both
  * at 1.5M rows.
  */
object RangeWindows {

  /** `(keyCol, valueCol)` of `df` + `<outPrefix>_sum` (DECIMAL, null on an
    * all-null frame) and `<outPrefix>_cnt` (LONG non-null-value count)
    * over `RANGE BETWEEN w PRECEDING AND CURRENT ROW` on
    * `ORDER BY keyCol ASC NULLS FIRST`, carrying `passthrough` columns.
    */
  def rangeSlidingSum(
      df: DataFrame,
      passthrough: Seq[String],
      keyCol: String,
      valueCol: String,
      w: Long,
      outPrefix: String = "frame"): DataFrame = {
    require(w >= 0L, s"frame width must be non-negative, got $w")
    graft.plans.GlobalRank.ensureRegistered(df.sparkSession)
    val vType = df.schema(valueCol).dataType
    require(vType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
      s"value column '$valueCol' must be DECIMAL for exact frame " +
        s"subtraction, got ${vType.simpleString} (cast first; float/double " +
        "prefixes cancel catastrophically under subtraction)")
    require(df.schema(keyCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"order key '$keyCol' must be BIGINT (cast dates/timestamps to day " +
        s"numbers / epoch micros), got ${df.schema(keyCol).dataType.simpleString}")

    val keep = passthrough.filterNot(c => c == keyCol || c == valueCol)
    val reals = df.select(
      (keep.map(col) ++ Seq(col(keyCol).as("__rw_sort"),
        lit(null).cast("long").as("__rw_for"),
        col(valueCol).as("__rw_v"), lit(0).as("__rw_g"))): _*)
    // one ghost per DISTINCT non-null key: the subtrahend depends on the
    // key alone. Ghost sorts at the exclusive threshold, after any real
    // rows there (reals at k − w − 1 are outside the frame and belong in
    // the subtrahend), and remembers the key it serves.
    val ghosts = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__rw_for")).distinct()
      .select((keep.map(c => lit(null).cast(df.schema(c).dataType).as(c)) ++
        Seq((col("__rw_for") - lit(w) - lit(1L)).as("__rw_sort"),
          col("__rw_for"), lit(null).cast(vType).as("__rw_v"),
          lit(1).as("__rw_g"))): _*)
    val win = Window.orderBy(col("__rw_sort"), col("__rw_g"))
    val scored = reals.unionByName(ghosts)
      .withColumn("__rw_s", sum(col("__rw_v")).over(win))
      .withColumn("__rw_c", count(col("__rw_v")).over(win))
    val thresholds = scored.filter(col("__rw_g") === 1)
      .select(col("__rw_for"), col("__rw_s").as("__rw_ts"),
        col("__rw_c").as("__rw_tc"))
    val sumT = scored.schema("__rw_s").dataType
    scored.filter(col("__rw_g") === 0).drop("__rw_for")
      .join(thresholds, col("__rw_sort") === col("__rw_for"), "left")
      .withColumn(s"${outPrefix}_cnt",
        col("__rw_c") - coalesce(col("__rw_tc"), lit(0L)))
      .withColumn(s"${outPrefix}_sum",
        when(col(s"${outPrefix}_cnt") === 0L, lit(null).cast(sumT))
          .otherwise(col("__rw_s") - coalesce(col("__rw_ts"), lit(0).cast(sumT))))
      .select((keep.map(col) ++ Seq(col("__rw_sort").as(keyCol),
        col("__rw_v").as(valueCol),
        col(s"${outPrefix}_sum"), col(s"${outPrefix}_cnt"))): _*)
  }

  /** The same frame's average: exact sum ÷ count, emitted as DOUBLE (the
    * cross-engine-stable shape: one IEEE division of a decimal-exact
    * numerator by an exact count). Null on an all-null frame.
    */
  def rangeSlidingAvg(
      df: DataFrame,
      passthrough: Seq[String],
      keyCol: String,
      valueCol: String,
      w: Long,
      outCol: String = "frame_avg"): DataFrame =
    rangeSlidingSum(df, passthrough, keyCol, valueCol, w)
      .withColumn(outCol,
        col("frame_sum").cast("double") / col("frame_cnt").cast("double"))
}
