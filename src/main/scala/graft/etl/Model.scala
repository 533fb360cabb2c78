package graft.etl

import java.sql.{Date, Timestamp}

/** Canonical schemas for the market-data pipeline (SURVEY.md §1.4).
  *
  * Mirrors the reference's data model: the `indices` dimension
  * (reference `src/config/indices.json:1-82`, required keys at
  * `src/config/settings.py:20`), the standardized long quote frame
  * (reference `src/data_processing/standardizer.py:222-235`), and the
  * daily FX-rate dimension (reference
  * `src/data_processing/currency_converter.py:19-42`).
  */
final case class IndexMeta(
    ticker: String,
    name: String,
    country: String,
    exchange: String,
    currency: String)

/** Standardized long quote row — E1 output / E2 input. Nullable numerics are
  * Options so the Encoder produces nullable columns (the reference's
  * Int64/float64 volume dance collapses into Spark-native nullability,
  * reference `standardizer.py:211-221`).
  */
final case class Quote(
    timestamp_utc: Timestamp,
    ticker: String,
    name: Option[String],
    country: Option[String],
    original_currency: Option[String],
    exchange: Option[String],
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Option[Double],
    adjusted_close: Option[Double],
    volume: Option[Long])

/** Daily FX rate — replaces the reference's frankfurter.app HTTP source
  * (reference `currency_converter.py:19-105`) with a broadcastable table.
  */
final case class FxRate(
    base_currency: String,
    target_currency: String,
    rate_date: Date,
    rate: Double)

object Schema {
  /** The 12 canonical standardized columns, in the reference's fixed order
    * (reference `standardizer.py:222-235`).
    */
  val canonicalQuoteCols: Seq[String] = Seq(
    "timestamp_utc", "ticker", "name", "country", "original_currency",
    "exchange", "open", "high", "low", "close", "adjusted_close", "volume")

  /** The five price columns that get converted to the target currency
    * (reference `currency_converter.py:176-185`).
    */
  val priceCols: Seq[String] =
    Seq("open", "high", "low", "close", "adjusted_close")
}
