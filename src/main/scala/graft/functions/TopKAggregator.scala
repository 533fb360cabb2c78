package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate flowing into the top-k aggregate. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k by (score desc, id asc) as a typed `Aggregator`, usable on
  * DataFrames via `functions.udaf`.
  *
  * This is the 100 TB shape for per-query nearest-neighbor ranking: the
  * aggregate keeps at most k candidates per group *inside each map task*
  * (partial aggregation), so the shuffle carries `partitions × k` rows per
  * query key instead of the entire scored corpus — a `row_number()` window
  * over the same data must shuffle and sort every scored row first
  * (SURVEY.md §4 custom-Catalyst inventory item 3).
  *
  * The buffer stays a small sorted vector (k ≤ ~100s); insertion cost is
  * O(k) per row, which beats a heap's constant factors at these sizes.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.size >= k && ord.gteq(in, buf.last)) buf
    else ((buf :+ in).sorted(ord)).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column function: `topK(k)(idCol, scoreCol)` → array<struct<id,score>>
    * ranked by (score desc, id asc).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Scored])
}
