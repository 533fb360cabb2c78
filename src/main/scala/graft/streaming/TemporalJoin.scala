package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key state of the temporal join: the reference version chain (ascending
  * event-time micros, compacted against the watermark) and the probe rows
  * whose match is not yet provably final.
  */
case class TemporalJoinState(
    versions: List[(Long, Double)],
    pending: List[(Long, Long, Double)])

/** One enriched probe row: the probe's identity/payload plus the reference
  * version in effect at its event time (None = no version yet existed).
  */
case class TemporalJoined(
    event_id: Long,
    user_id: Long,
    ts_us: Long,
    value: Double,
    ref_ts_us: Option[Long],
    ref_value: Option[Double])

/** Event-time TEMPORAL JOIN: enrich a probe stream with the reference
  * version in effect AT each probe row's event time, where the reference is
  * itself a STREAM of versioned changes (a dimension's change feed). This is
  * the streaming face of the native as-of join for the case the existing
  * foreachBatch lane cannot cover — a right side that is not static — and
  * the live-lookup face of e14's SCD2 history while it is still being
  * written. Flink ships this as the "temporal table join"; stock Spark has
  * no equivalent: stream-stream joins bound BOTH sides' state by a time
  * range, but a dimension's current version must outlive any range (a key
  * may not change for months and must still enrich today's probes).
  *
  * Mechanics (`flatMapGroupsWithState`, Append, event-time timeout), one
  * state entry per key:
  *  - reference changes insert into a sorted version chain; equal-ts
  *    versions keep the max value (the same tie rule as a13's
  *    `asofPurchases` pre-aggregation, so the batch comparator is exact);
  *  - probe rows BUFFER until the watermark passes their event time — only
  *    then is "latest version at-or-before pts" provably final (any
  *    still-admissible change has rts ≥ watermark > pts). Matching happens
  *    at emission against the full chain, so in-batch and cross-batch
  *    arrival order is irrelevant — no ordering contract at all, unlike
  *    [[StreamingIngest.sessionCloser]]'s per-key-ordered delivery
  *    assumption;
  *  - emission is exactly-once per probe row (a probe leaves `pending`
  *    in the same invocation that emits it), deterministic (ready rows
  *    sorted by (ts, event_id)), and watermark-gated like every Append
  *    operator in this module.
  *
  * State bound (the unbounded-stream contract): after each firing the
  * version chain is compacted to the newest version at-or-below the
  * watermark plus those above it — pending probes all have pts ≥ watermark,
  * so of the older versions only the newest can ever match again. Steady
  * state is O(1 + changes-within-lateness) per key, and the surviving
  * single version IS the dimension's current value — exactly Flink's
  * temporal-table state. Pending probes are bounded by the lateness window
  * by construction. Keys with a version but no pending probes keep their
  * state with NO timeout: a dimension's current version never expires.
  *
  * StreamingSpec proves the batch-equivalence law: over an AvailableNow
  * drain in forced multi-file micro-batches, the emitted rows equal the
  * BATCH native as-of join (a13b's exec) restricted to watermark-closed
  * probes — same completeness sandwich as the session closer — and each
  * event_id is emitted exactly once.
  */
object TemporalJoin {

  /** Events-table face: clicks (probe lane) enriched with the purchase
    * version (reference lane) in effect at click time.
    */
  def temporalJoin(
      events: DataFrame,
      tsCol: String,
      lateness: String): Dataset[TemporalJoined] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tagged = events
      .withWatermark(tsCol, lateness)
      .filter(col("event_type").isin("purchase", "click"))
      .select(
        col("user_id").cast("long").as("k"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        unix_micros(col(tsCol)).as("ts_us"),
        col("event_id").cast("long").as("ev_id"),
        col("value").cast("double").as("v"),
        col(tsCol).as("evt_ts"))
      .as[(Long, Int, Long, Long, Double, java.sql.Timestamp)]
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        process)
  }

  private def process(
      user: Long,
      it: Iterator[(Long, Int, Long, Long, Double, java.sql.Timestamp)],
      st: GroupState[TemporalJoinState]): Iterator[TemporalJoined] = {
    val st0 = st.getOption.getOrElse(TemporalJoinState(Nil, Nil))
    var versions = st0.versions
    var pending = st0.pending
    if (!st.hasTimedOut) {
      // gather the batch's changes and merge them into the chain in ONE
      // sorted pass — O(chain + batch log batch), no per-row list rebuild
      // (a naive per-insert walk is quadratic AND stack-deep on the long
      // chains a backfill builds while the watermark still lags)
      val changes = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      it.foreach { case (_, side, ts, evId, v, _) =>
        if (side == 0) changes += ((ts, v))
        else pending ::= ((ts, evId, v))
      }
      if (changes.nonEmpty) versions = mergeVersions(versions, changes)
    }
    val wmUs = st.getCurrentWatermarkMs * 1000L
    // a probe is final strictly below the watermark: rows AT the watermark
    // are still admissible, so a change with rts == pts could yet arrive
    val (ready, stillPending) = pending.partition(_._1 < wmUs)
    val out = ready.sortBy(p => (p._1, p._2)).map { case (pts, evId, pv) =>
      val m = versions.takeWhile(_._1 <= pts).lastOption
      TemporalJoined(evId, user, pts, pv, m.map(_._1), m.map(_._2))
    }
    val compacted = compact(versions, wmUs)
    if (compacted.isEmpty && stillPending.isEmpty) {
      // a key with neither versions nor pending probes carries no
      // information — dropping the entry is observationally identical
      st.remove()
    } else {
      st.update(TemporalJoinState(compacted, stillPending))
      if (stillPending.nonEmpty)
        st.setTimeoutTimestamp(math.max(
          stillPending.map(_._1).min / 1000L + 1L,
          st.getCurrentWatermarkMs + 1L))
      // versions with no pending probes: state persists WITHOUT a timeout —
      // the dimension's current version must outlive any time bound
    }
    out.iterator
  }

  /** Merge a batch of changes into the ascending chain in one iterative
    * pass; equal-ts versions keep the max value (the a13 `asofPurchases`
    * tie rule). Iterative and single-pass on purpose: during a backfill
    * the watermark lags event time, [[compact]] cannot trim, and a hot
    * key's chain can hold every change in the lag window — per-row
    * recursive inserts would be quadratic and stack-overflow-deep.
    */
  private def mergeVersions(
      vs: List[(Long, Double)],
      batch: scala.collection.mutable.ArrayBuffer[(Long, Double)]): List[(Long, Double)] = {
    val sorted = batch.sortInPlace()(Ordering.by[(Long, Double), Long](_._1))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var rest = vs
    var i = 0
    def pushOrFold(e: (Long, Double)): Unit =
      if (out.nonEmpty && out.last._1 == e._1)
        out(out.length - 1) = (e._1, math.max(out.last._2, e._2))
      else out += e
    while (i < sorted.length || rest.nonEmpty) {
      if (rest.isEmpty || (i < sorted.length && sorted(i)._1 <= rest.head._1)) {
        pushOrFold(sorted(i)); i += 1
      } else { pushOrFold(rest.head); rest = rest.tail }
    }
    out.toList
  }

  /** Keep the newest version strictly below the watermark (boundary rows are
    * still admissible, so `<` is the safe cut) plus everything at-or-above:
    * pending and future probes all have pts ≥ watermark, so older versions
    * can never be the as-of match again.
    */
  private def compact(
      vs: List[(Long, Double)], wmUs: Long): List[(Long, Double)] = {
    val (below, above) = vs.partition(_._1 < wmUs)
    below.lastOption.toList ::: above
  }
}
