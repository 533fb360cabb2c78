package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Pluggable multi-ticker OHLCV bar source — the ingestion seam for the
  * reference's front door (`/root/reference/src/data_collection/yf_collector.py:50-59`),
  * mirroring [[RateProvider]]: a real deployment implements `fetchWide`
  * against its market-data vendor; tests and offline runs plug a static or
  * staged-parquet implementation.
  *
  * The fetched frame is WIDE: one `ts` timestamp column plus one
  * `<ticker>:<field>` column per (ticker, OHLCV field) — the Spark-side
  * representation of yfinance's `group_by="ticker"` MultiIndex columns.
  * Timezone preservation: Spark timestamps are instants, so a tz-aware feed
  * arrives already normalized; tz-naive daily bars go through
  * [[Standardizer.toUtc]]'s `sourceTz` branch (≙ the reference's
  * `ignore_tz=False` + localize-vs-convert handling).
  */
trait BarSource {
  def fetchWide(
      spark: SparkSession,
      tickers: Seq[String],
      period: String,
      interval: String): DataFrame
}

/** Reads a staged wide parquet drop (the batch-deployment shape: a collector
  * job lands vendor files; Spark ingests them). Projects to the requested
  * tickers so column pruning reaches the scan.
  */
final class StagedParquetBarSource(path: String) extends BarSource {
  def fetchWide(
      spark: SparkSession,
      tickers: Seq[String],
      period: String,
      interval: String): DataFrame = {
    val wide = spark.read.parquet(path)
    val keep = wide.columns.toIndexedSeq.filter(c =>
      c == "ts" || tickers.exists(t => c.startsWith(s"$t:")))
    wide.select(keep.map(col): _*)
  }
}

/** Deterministic in-memory source for tests/offline runs (≙ the reference's
  * recorded-fixture testing path).
  */
final class StaticBarSource(frame: DataFrame) extends BarSource {
  def fetchWide(
      spark: SparkSession,
      tickers: Seq[String],
      period: String,
      interval: String): DataFrame = {
    val keep = frame.columns.toIndexedSeq.filter(c =>
      c == "ts" || tickers.exists(t => c.startsWith(s"$t:")))
    frame.select(keep.map(col): _*)
  }
}

/** S1 full — fetch → validate → unpivot → standardize, the composed ingest
  * that turns a vendor-wide fetch into the canonical long quote frame.
  */
object BarIngest {

  /** The expected per-ticker OHLCV fields (reference `yf_collector.py:76`). */
  val ExpectedFields: Set[String] =
    Set("Open", "High", "Low", "Close", "Adj Close", "Volume")

  /** Expected-column validation ≙ `yf_collector.py:74-92`: per requested
    * ticker, the expected fields absent from the fetched frame. The
    * reference only WARNS on missing fields and proceeds (downstream
    * tolerates absent value columns); callers surface this map in their run
    * logs the same way.
    */
  def missingFields(wide: DataFrame, tickers: Seq[String]): Map[String, Set[String]] =
    tickers.map { t =>
      val present = wide.columns.collect {
        case c if c.startsWith(s"$t:") => c.stripPrefix(s"$t:")
      }.toSet
      t -> (ExpectedFields -- present)
    }.toMap.filter(_._2.nonEmpty)

  /** Fetch bars for `tickers` through `source` and standardize them (E1).
    *
    * Hard-fails on the reference's hard-fail paths: empty ticker list
    * (`yf_collector.py:42-44`) and a fetch with no recognizable ticker
    * columns (`yf_collector.py:61-65` empty-data branch); missing *fields*
    * for a present ticker are tolerated as nulls (`standardizer.py:88-102`
    * via `unpivotWide`'s null fill).
    */
  def fetchStandardized(
      spark: SparkSession,
      source: BarSource,
      tickers: Seq[String],
      dim: DataFrame,
      period: String = "7d",
      interval: String = "60m",
      sourceTz: Option[String] = None): DataFrame = {
    require(tickers.nonEmpty, "tickers list is empty (yf_collector.py:42-44)")
    val wide = source.fetchWide(spark, tickers, period, interval)
    require(wide.columns.contains("ts"), "fetched frame has no ts column")
    // A source that ignores the requested pruning could return only OTHER
    // tickers' columns — some ':' column existing is not enough; at least
    // one REQUESTED ticker must have data or the fetch is empty for this
    // call's purposes (yf_collector.py:61-65 empty-data). Fully-absent
    // tickers among a partially-served request surface via missingFields
    // (they map to all six expected fields).
    require(tickers.exists(t => wide.columns.exists(_.startsWith(s"$t:"))),
      s"fetch returned no <ticker>:<field> columns for any requested ticker " +
        s"of ${tickers.mkString(",")} (yf_collector.py:61-65 empty-data)")
    Standardizer.standardize(Standardizer.unpivotWide(wide), dim, sourceTz)
  }
}
