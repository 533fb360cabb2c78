package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (term, estimated count) row out of the frequent-items summary. */
final case class FreqItem(term: String, est: Long)

/** Misra–Gries frequent-items ("heavy hitters") summary as a typed,
  * MERGEABLE `Aggregator` — the fixed-memory answer to "what are the most
  * frequent tokens/URLs/shingles in 100 TB" when an exact term-keyed
  * aggregate (T5's shape) is too hot to shuffle: each map task keeps at
  * most k counters regardless of input size, the shuffle carries
  * `partitions × k` rows total, and merging summaries preserves the error
  * bound (Agarwal et al., "Mergeable Summaries", PODS 2012 — same family
  * as the HLL/quantile sketches behind A9b/A15b/A23).
  *
  * Estimates are BIASED LOW with bounded error: for every item,
  * `true - N/(k+1) ≤ est ≤ true` (N = stream length), and any item with
  * `true > N/(k+1)` is guaranteed present in the summary. Like every
  * sketch here, partial-merge order varies with scheduling, so estimates
  * may wobble within the bound run-to-run — rows-only in the oracle gate,
  * with the bound owned by the spec (the A15b contract).
  *
  * reduce: hit → increment; miss with a free slot → insert at 1; miss with
  * k full → decrement ALL (the classic Misra–Gries step), dropping zeros.
  * merge: sum counts, then if over k keep the top-k by count and subtract
  * the (k+1)-th largest from the survivors — the mergeable-summaries rule.
  */
class FrequentItemsAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[FreqItem]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k => buf.updated(term, 1L)
      case None =>
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val counts = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)
      val cut = counts(k) // (k+1)-th largest
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[FreqItem] =
    buf.toSeq.map { case (t, c) => FreqItem(t, c) }
      .sortBy(f => (-f.est, f.term))

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[FreqItem]] = ExpressionEncoder()
}

object FrequentItemsAggregator {
  /** Column function: `frequentItems(k)(termCol)` →
    * array<struct<term,est>> ranked by (est desc, term asc).
    */
  def frequentItems(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FrequentItemsAggregator(k), Encoders.STRING)
}
