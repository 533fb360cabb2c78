package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, IntegerType, LongType, NumericType, TimestampType}

/** Distributed total-order ranking.
  *
  * Spark's own `row_number()/ntile()` over a global ORDER BY (no
  * PARTITION BY) plans a single-partition Window — every row funnels
  * through ONE task, which is the hard scale cliff for any corpus-wide
  * ordering (curriculum sorting, global percentile cuts, deterministic
  * train/eval splits by rank). This operator computes the SAME ranks with
  * no single-task stage, the classic two-phase distributed rank:
  *
  *  1. Bucket the corpus into order-contiguous ranges. The bucket is a
  *     PURE FUNCTION of the row — the count of approx-quantile bounds
  *     (collected ONCE, embedded as literals) strictly below the head
  *     order key — so every evaluation of the frame assigns identical
  *     buckets. This is load-bearing: `repartitionByRange`'s sampled
  *     bounds are seeded by `rdd.id` and DRIFT between the offsets job
  *     and the final job, which silently corrupts global ranks
  *     (duplicates + gaps) — invisible at small scale, caught by the 10×
  *     replica gate (`tools/VerifySf1`, c8 emitted 11 ntile bins).
  *  2. Per-bucket local ranks ride an ordinary KEYED window
  *     (`row_number() OVER (PARTITION BY bucket ORDER BY key)`) — one
  *     hash exchange on the bucket id, parallelism = #buckets, never a
  *     single-task global Window. Bucket row-counts (one partial-combined
  *     aggregate, ≤ #buckets rows — a bounded driver collect like T8's)
  *     become cumulative offsets, broadcast back:
  *     `global_rank = offset(bucket) + local_rank`.
  *
  * Determinism: bucket assignment is literal arithmetic; the in-bucket
  * window sorts a TOTAL order (callers must pass a tie-broken key, e.g.
  * `(score, doc_id)`), so ranks are a permutation of 1..n on every
  * evaluation. Equal head keys always land in one bucket (strict-less
  * counting), so ranks never depend on where the sampled bounds fell —
  * bound quality affects only balance, never correctness.
  *
  * Contract: the HEAD of `order` must be an ascending, double-castable
  * key (it feeds `approxQuantile`); heavy ties on it concentrate a bucket
  * the same way any range partitioning of a skewed key does.
  */
object Ranking {

  private def bucketOf(head: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else {
      // count of bounds strictly below the key — monotone in the total
      // order, so buckets are order-contiguous; NULL keys sort first in
      // Spark ascending order and take bucket 0
      val k = head.cast("double")
      val cnt = bounds.toSeq.map(b => when(k > lit(b), 1).otherwise(0)).reduce(_ + _)
      when(k.isNull, lit(0)).otherwise(cnt)
    }

  /** `df` plus `global_rank` (1-based, dense total order) over `order`.
    * `buckets` bounds the rank stage's parallelism (#buckets ≈ #shuffle
    * partitions at the target scale).
    */
  def globalRank(df: DataFrame, order: Seq[Column], buckets: Int = 32): DataFrame = {
    // Fail fast on a head key that is not MEANINGFULLY double-castable: a
    // string head casts to all-null, approxQuantile returns empty bounds,
    // and every row would silently collapse into bucket 0 — a single-task
    // keyed window, exactly the cliff this operator exists to avoid.
    val headType = df.select(order.head).schema.head.dataType
    require(headType match {
      case _: NumericType | _: TimestampType | _: DateType | _: BooleanType => true
      case _ => false
    }, s"globalRank order head must be numeric/timestamp/date/boolean " +
      s"(double-castable for quantile bucketing), got $headType — " +
      "use GlobalRankExec (SQL window rewrite) for arbitrary orderable keys")
    // one deterministic pass: (buckets-1) approximate quantile cuts of the
    // head key, collected once and fixed as literals for EVERY downstream
    // evaluation (offsets job and final job must agree on the bucketing)
    val qdf = df.select(order.head.cast("double").as("__rk"))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = qdf.stat.approxQuantile("__rk", probs, 1.0 / (buckets * 8)).distinct
    val keyed = df.withColumn("rank_bucket", bucketOf(order.head, bounds).cast(IntegerType))
    val w = Window.partitionBy(col("rank_bucket")).orderBy(order: _*)
    val local = keyed.withColumn("local_rank", row_number().over(w).cast(LongType))
    // Bucket sizes → cumulative offsets. Buckets are index-ordered by key
    // range, so the offset of bucket b is the total count of buckets < b.
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
