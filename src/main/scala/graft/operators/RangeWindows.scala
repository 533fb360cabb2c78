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
  * The composition that stays distributed — the GHOST-PROBE subtraction:
  *
  *  1. every row `(id, k, v)` spawns a NULL-valued ghost at key
  *     `k − w − 1` (the frame's exclusive lower threshold; integral keys);
  *  2. ONE running aggregate over the union, ordered by
  *     `(k, isGhost)` with the SQL-default peer-inclusive RANGE frame —
  *     [[graft.plans.GlobalRankRule]] rewrites it to the distributed
  *     [[graft.plans.GlobalRankExec]] — gives REAL rows the prefix
  *     through their full peer run (the frame's inclusive top) and GHOSTS
  *     the prefix through every real row at key ≤ k − w − 1 (ghosts sort
  *     AFTER the reals of their key and contribute nothing: sum/count
  *     ignore their null values);
  *  3. an equi-join on the unique row id brings each ghost's threshold
  *     prefix back to its real row; the frame value is the exact
  *     difference — `sum[k−w, k] = prefix(k) − prefix(k−w−1)`, with the
  *     companion count lane deciding the SQL all-null-frame NULL.
  *
  * Cost shape: one range exchange over 2N rows (the window) plus one hash
  * join on the id — no single-task stage, no value-dependent halo, no
  * driver traffic beyond the exec's usual O(#partitions). Exactness: the
  * caller passes a DECIMAL value column, so prefix sums are exact and the
  * subtraction introduces no error (the reason float/double inputs are
  * rejected — a running double prefix cancels catastrophically under
  * subtraction, the same veto the ROWS-sliding rewrite applies).
  *
  * Scope and contracts:
  *  - `keyCol` must be long-backed (BIGINT; cast dates/timestamps to
  *    day numbers / epoch micros first), NON-NULL (SQL gives null-key
  *    rows their own peer-group frame; reject rather than silently
  *    diverge), and > Long.MinValue + w + 1 (threshold underflow);
  *  - `idCol` must be unique (the join-back key);
  *  - `valueCol` must be DECIMAL (exact subtraction) — counts ride along;
  *  - sum/count/avg only: min/max cannot be recovered by subtraction
  *    (no inverse), and that residue stays on the PlanChecks lint.
  *
  * RangeWindowsSpec pins bit-equality against Spark's stock
  * single-partition `rangeBetween` Window on randomized tied/null
  * corpora; the `e19_range_sliding` gate row pins the semantics against
  * DuckDB's native RANGE window engine.
  */
object RangeWindows {

  /** `df` + `<outPrefix>_sum` (DECIMAL, null on an all-null frame),
    * `<outPrefix>_cnt` (LONG non-null-value count) over
    * `RANGE BETWEEN w PRECEDING AND CURRENT ROW` on `ORDER BY keyCol`.
    */
  def rangeSlidingSum(
      df: DataFrame,
      idCol: String,
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

    val reals = df.select(col(idCol).as("__rw_id"), col(keyCol).as("__rw_k"),
        col(valueCol).as("__rw_v"))
      .withColumn("__rw_g", lit(0))
    val ghosts = reals.select(col("__rw_id"),
      (col("__rw_k") - lit(w) - lit(1L)).as("__rw_k"),
      lit(null).cast(vType).as("__rw_v"), lit(1).as("__rw_g"))
    // ONE window, the SQL-default RANGE frame over (k, isGhost): real rows
    // read their peer-run-end prefix (frame top inclusive of ties), ghosts
    // — their own runs, sorted after the reals of their key — read the
    // threshold prefix. GlobalRankRule rewrites this to the distributed
    // exec; the tie-run buffering is bounded by key multiplicity exactly
    // as for any RANGE running aggregate.
    val win = Window.orderBy(col("__rw_k"), col("__rw_g"))
    val scored = reals.unionByName(ghosts)
      .withColumn("__rw_s", sum(col("__rw_v")).over(win))
      .withColumn("__rw_c", count(col("__rw_v")).over(win))
    val thresholds = scored.filter(col("__rw_g") === 1)
      .select(col("__rw_id"), col("__rw_s").as("__rw_ts"),
        col("__rw_c").as("__rw_tc"))
    val sumT = scored.schema("__rw_s").dataType
    scored.filter(col("__rw_g") === 0)
      .join(thresholds, "__rw_id")
      .withColumn(s"${outPrefix}_cnt", col("__rw_c") - col("__rw_tc"))
      .withColumn(s"${outPrefix}_sum",
        when(col(s"${outPrefix}_cnt") === 0L, lit(null).cast(sumT))
          .otherwise(col("__rw_s") - coalesce(col("__rw_ts"), lit(0).cast(sumT))))
      .withColumnRenamed("__rw_id", idCol)
      .select(col(idCol), col("__rw_k").as(keyCol), col("__rw_v").as(valueCol),
        col(s"${outPrefix}_sum"), col(s"${outPrefix}_cnt"))
  }

  /** The same frame's average: exact sum ÷ count, emitted as DOUBLE (the
    * cross-engine-stable shape: one IEEE division of a decimal-exact
    * numerator by an exact count). Null on an all-null frame.
    */
  def rangeSlidingAvg(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      valueCol: String,
      w: Long,
      outCol: String = "frame_avg"): DataFrame =
    rangeSlidingSum(df, idCol, keyCol, valueCol, w)
      .withColumn(outCol,
        col("frame_sum").cast("double") / col("frame_cnt").cast("double"))
}
