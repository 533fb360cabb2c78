package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the knobs that decide whether the 100 TB plan
  * shuffles or streams.
  *
  *  - '''Partitioned sinks''': directory partitioning on low-cardinality
  *    columns (dates, shards) so predicate `WHERE dt = …` prunes at file
  *    listing time — the lake analogue of the reference's
  *    `(ticker, timestamp)` PK locality (`postgres_writer.py:76-93`).
  *  - '''Bucketed tables''': co-locate both sides of a recurring equi-join
  *    (orders ⋈ lineitem on orderkey) by hash-bucketing at write time; the
  *    join then plans with ZERO exchanges — at 1000 executors that is the
  *    difference between an all-to-all network pass over both facts and a
  *    local merge.
  *  - '''Salted joins''': when one key dominates (power-law skew), AQE's
  *    skew-join splitting handles sort-merge; for broadcast-incompatible
  *    skewed aggregations/joins the classic fix is an explicit salt that
  *    fans the hot key across `buckets` reducers.
  */
object Layout {

  /** Write `df` as a directory-partitioned parquet dataset. Callers pick
    * partition columns with bounded cardinality (a date, a 2-hex-char shard
    * — see `TextQueries.fingerprint.shard_bucket`), so file counts stay
    * sane and pruning is effective.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Persist `df` as a hash-bucketed, per-bucket-sorted managed table.
    * Joins/aggregations on `bucketCols` against tables bucketed the same
    * way plan without a shuffle (verified in LayoutSpec).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Explicit skew-salted inner equi-join: the fact side gets a
    * deterministic salt in [0, buckets) derived from `saltSource` (any
    * roughly-uniform column, e.g. a line number or hash of the row id); the
    * dim side is replicated `buckets`× with every salt value. The join key
    * becomes (keys…, salt), so a hot key's rows spread over `buckets`
    * reducers instead of one.
    *
    * Result equals the plain inner join on `keys` (proved in LayoutSpec);
    * cost is the `buckets`× replication of the (small) right side.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      buckets: Int,
      saltSource: Column): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
