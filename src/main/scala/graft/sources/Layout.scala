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

  /** Scale a numeric column into the `[0, 2^bits)` integer domain a
    * Z-order interleave needs: rank-free min/max normalization (the two
    * scalars come from stats the writer already has — a footer read or a
    * 2-value aggregate, never a sort). Values outside `[min, max]` clamp.
    */
  def scaleToBits(c: Column, min: Double, max: Double, bits: Int): Column = {
    val span = math.max(max - min, java.lang.Double.MIN_VALUE)
    val top = (1L << bits) - 1
    least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) / lit(span) * lit(top.toDouble)).cast("long")))
  }

  /** Z-order (Morton) interleave of up to 4 pre-scaled `[0, 2^bits)`
    * columns: bit i of column j lands at position `i * n + j`, so a range
    * on ANY input dimension maps to a bounded set of contiguous Z-ranges.
    * Sorting a dataset by this value before writing gives every file tight
    * min/max envelopes on EVERY input column at once — the multi-dimension
    * file/row-group-skipping layout (Delta/Iceberg `OPTIMIZE ZORDER BY`)
    * that linear sort keys cannot provide: a linear sort prunes its
    * leading column only, and files span the full range of every other
    * dimension. Pure codegen'd bit arithmetic — `bits × n` shift/mask
    * terms, no UDF.
    */
  def zOrderValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size <= 4, "z-order supports 1-4 columns")
    require(bits * cols.size <= 62, s"bits=$bits × ${cols.size} cols overflows a long")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** Write `df` Z-ordered on `dims` (column name → (min, max) stats):
    * range-partition + sort by the Morton value, so both the file split
    * points AND the within-file row-group order follow the curve. The sort
    * key is dropped from the written schema — layout is a property of row
    * ORDER, not of the data.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dims: Seq[(String, (Double, Double))],
      files: Int,
      bits: Int = 16): Unit = {
    val z = zOrderValue(
      dims.map { case (name, (lo, hi)) => scaleToBits(col(name), lo, hi, bits) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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
