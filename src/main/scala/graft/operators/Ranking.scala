package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Distributed total-order ranking.
  *
  * Spark's own `row_number()/ntile()` over a global ORDER BY (no
  * PARTITION BY) plans a single-partition Window — every row funnels
  * through ONE task, which is the hard scale cliff for any corpus-wide
  * ordering (curriculum sorting, global percentile cuts, deterministic
  * train/eval splits by rank). This operator computes the SAME ranks with
  * no single-task stage, the classic two-phase distributed rank:
  *
  *  1. `repartitionByRange` on the order key (range exchange — the same
  *     machinery a global sort uses), then an in-partition sort and a
  *     per-partition streamed local rank. The local rank rides
  *     `monotonically_increasing_id()` — Spark's documented
  *     `(partitionId << 33) + rowIndexInPartition` assignment, evaluated
  *     in iteration order ABOVE the in-partition sort (Catalyst never
  *     reorders a nondeterministic projection through a Sort) — so both
  *     the bucket id and the 1-based local rank are pure bit arithmetic
  *     inside whole-stage codegen: no external `Row` rebuild per row, no
  *     encoder boundary, no codegen break. (The id's 33-bit row field
  *     bounds a single range bucket at 2³³ ≈ 8.6 B rows — with buckets
  *     sized to the shuffle parallelism, orders of magnitude above any
  *     sane per-partition row count.)
  *  2. Bucket row-counts (one partial-combined aggregate over the SAME
  *     shuffle output — Catalyst's ReuseExchange dedups the exchange, so
  *     the corpus shuffles once) are collected — ≤ #buckets rows, a
  *     bounded driver collect like T8's — turned into cumulative offsets,
  *     and broadcast back. `global_rank = offset(bucket) + local_rank`.
  *
  * Determinism: range-partitioner bounds are sampled and NOT stable run
  * to run, but any order-contiguous bucketing yields the same global rank
  * as long as the order key is a TOTAL order — callers must pass a
  * tie-broken key (e.g. `(score, doc_id)`). Equal keys always land in one
  * bucket, so ranks never depend on where the sampled bounds fell.
  */
object Ranking {

  /** `df` plus `global_rank` (1-based, dense total order) over `order`.
    * `buckets` bounds the range exchange's parallelism (#buckets ≈
    * #shuffle partitions at the target scale).
    */
  def globalRank(df: DataFrame, order: Seq[Column], buckets: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(buckets, order: _*).sortWithinPartitions(order: _*)
    val local = ranged
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("rank_bucket", shiftright(col("__mid"), 33).cast(IntegerType))
      .withColumn("local_rank", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__mid")
    // Bucket sizes → cumulative offsets. Range buckets are index-ordered by
    // key range, so the offset of bucket b is the total count of buckets < b.
    val counts = local.groupBy(col("rank_bucket")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = acc; acc += c; (b, o) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("rank_bucket", "rank_offset")
    local.join(broadcast(offsetDf), "rank_bucket")
      .withColumn("global_rank", col("rank_offset") + col("local_rank"))
      .drop("rank_bucket", "local_rank", "rank_offset")
  }

  /** SQL-standard NTILE(k) over a global total order, distributed: the
    * first `n % k` tiles carry `n/k + 1` rows, the rest `n/k` — bit-for-bit
    * the semantics of `ntile(k) OVER (ORDER BY ...)`, with no
    * single-partition Window. Output column: `bin` (INT, 1-based).
    */
  def ntile(df: DataFrame, k: Int, order: Seq[Column], buckets: Int = 32): DataFrame = {
    require(k > 0, s"ntile k must be positive, got $k")
    val ranked = globalRank(df, order, buckets)
    // n is already on the driver as the sum of bucket counts — but globalRank
    // hides it; recover it as a literal-free plan via a 1-row broadcast would
    // re-aggregate the corpus. The rank pass collected the bucket counts, so
    // thread n through cheaply: max rank IS n. A 1-row broadcast of max(rank)
    // over the ranked output re-reads the reused exchange, not the raw corpus.
    val n1 = ranked.agg(max(col("global_rank")).as("n_total"))
    val out = ranked.crossJoin(broadcast(n1))
    val q = col("n_total").cast(LongType) / lit(k.toLong)
    val qf = floor(q).cast(LongType) // n/k
    val r = col("n_total") % lit(k.toLong) // n%k
    val rk = col("global_rank") - lit(1L) // 0-based rank
    val cut = r * (qf + lit(1L)) // rows in the fat tiles
    val bin = when(rk < cut, floor(rk / (qf + lit(1L))))
      .otherwise(r + floor((rk - cut) / greatest(qf, lit(1L)))) + lit(1)
    out.withColumn("bin", bin.cast(IntegerType)).drop("n_total")
  }
}
