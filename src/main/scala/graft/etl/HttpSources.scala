package graft.etl

import java.net.{URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDateTime, ZoneOffset}

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType, TimestampType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal injectable HTTP GET seam: the live deployment uses
  * [[JdkHttpTransport]]; tests script responses (and failures) offline.
  * Implementations throw on transport failure (connect/timeout) AND on
  * non-2xx status — callers map every failure class to their vendor's
  * error semantics, mirroring the reference's exception ladder
  * (`currency_converter.py:71-105`).
  */
trait HttpTransport {
  def get(url: String, timeoutMillis: Int): String
}

/** Production transport on the JDK 11+ HttpClient. The reference pins
  * requests to IPv4 (`currency_converter.py:16-17`, a frankfurter.app
  * DNS quirk); the JVM-wide analogue is `-Djava.net.preferIPv4Stack=true`,
  * left to deployment config rather than set process-globally here.
  */
object JdkHttpTransport extends HttpTransport {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  def get(url: String, timeoutMillis: Int): String = {
    val req = java.net.http.HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMillis))
      .GET()
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }
}

/** Live FX-rate provider against a frankfurter.app-shaped API (the
  * reference's actual front door, `currency_converter.py:42-48`:
  * `GET {base}/{date}?from=X&to=Y`, 15 s timeout, JSON
  * `{"rates": {"USD": 1.08}}`).
  *
  * Error semantics match the reference exactly (`currency_converter.py:50-105`):
  *  - identity pair → 1.0 without a request;
  *  - every failure class — transport error, timeout, non-2xx, JSON decode
  *    error, missing or null rate in the body — records a NEGATIVE cache
  *    entry and yields no rate (the pair's converted values stay null
  *    downstream, `README.md:381`), and is never re-requested;
  *  - successes memoize positively.
  * The caches make call volume ≤ #distinct (currency, date) pairs per
  * process lifetime — the same bound the reference's module-level
  * RATE_CACHE/CACHE_MISSES give it. Thread-safe via synchronized maps
  * (call volume is bounded, contention irrelevant).
  */
final class HttpRateProvider(
    transport: HttpTransport,
    baseUrl: String = "https://api.frankfurter.app",
    timeoutMillis: Int = 15000) extends RateProvider {

  private val hits = mutable.Map[(String, String, java.sql.Date), Double]()
  private val misses = mutable.Set[(String, String, java.sql.Date)]()

  def rates(pairs: Seq[(String, java.sql.Date)], target: String): Seq[FxRate] =
    pairs.flatMap { case (ccy, d) =>
      rate(ccy, target, d).map(r => FxRate(ccy, target, d, r))
    }

  /** One (base, target, date) lookup through the memo caches. */
  def rate(base: String, target: String, d: java.sql.Date): Option[Double] = {
    if (base == target) return Some(1.0) // currency_converter.py:32-33
    val key = (base, target, d)
    synchronized {
      if (hits.contains(key)) return Some(hits(key))
      if (misses.contains(key)) return None
    }
    val url = s"$baseUrl/$d?from=${enc(base)}&to=${enc(target)}"
    val fetched: Option[Double] =
      try {
        JsonMethods.parse(transport.get(url, timeoutMillis)) \ "rates" \ target match {
          case JDouble(r) => Some(r)
          case JInt(r) => Some(r.toDouble)
          case JDecimal(r) => Some(r.toDouble)
          case _ => None // missing or null rate → miss (currency_converter.py:53-69)
        }
      } catch {
        // HTTP / connection / timeout / JSON decode → miss, never rethrown
        // (currency_converter.py:71-105)
        case NonFatal(_) => None
      }
    synchronized {
      fetched match {
        case Some(r) => hits(key) = r
        case None => misses += key
      }
    }
    fetched
  }

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
}

/** Live OHLCV bar source against an HTTP vendor endpoint
  * (`GET {base}/bars?tickers=A,B&period=7d&interval=60m`) returning the wide
  * frame as CSV: a `ts` column of ISO-8601 instants plus one
  * `<ticker>:<field>` column per (ticker, OHLCV field); empty cells are
  * nulls. This is the Spark-side stand-in for the reference's yfinance call
  * (`yf_collector.py:50-59` — a batch download of the whole watchlist in
  * one request).
  *
  * Transient transport failures retry up to `maxAttempts` (yfinance retries
  * internally; the reference sees only the final failure); the last failure
  * propagates — the reference's fetch-returned-None hard-fail path
  * (`yf_collector.py:98-99` → `main.py` aborts the run).
  *
  * The response is parsed driver-side: a bar fetch is bounded by
  * watchlist × period (the reference holds the same frame in pandas), never
  * corpus-sized. Values parse as doubles (Standardizer's T4 `try_cast`
  * owns final typing); unparsable cells become null rather than failing the
  * batch, matching yfinance's NaN-for-bad-data behavior.
  */
final class HttpBarSource(
    transport: HttpTransport,
    baseUrl: String,
    timeoutMillis: Int = 15000,
    maxAttempts: Int = 3) extends BarSource {

  def fetchWide(
      spark: SparkSession,
      tickers: Seq[String],
      period: String,
      interval: String): DataFrame = {
    val url = s"$baseUrl/bars?tickers=${enc(tickers.mkString(","))}" +
      s"&period=${enc(period)}&interval=${enc(interval)}"
    val body = withRetry(maxAttempts) { transport.get(url, timeoutMillis) }
    val wide = parseWideCsv(spark, body)
    val keep = wide.columns.toIndexedSeq.filter(c =>
      c == "ts" || tickers.exists(t => c.startsWith(s"$t:")))
    // wide.col, not functions.col: dotted tickers ("BRK.B:Close") would
    // otherwise parse as struct-field access and fail resolution
    wide.select(keep.map(wide.col): _*)
  }

  private def withRetry[A](attempts: Int)(body: => A): A = {
    var left = attempts
    while (true) {
      try return body
      catch { case NonFatal(e) => left -= 1; if (left <= 0) throw e }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Header `ts,<ticker>:<field>,...`; one row per timestamp. The vendor
    * contract has no quoted commas (tickers/fields never contain one).
    */
  private def parseWideCsv(spark: SparkSession, body: String): DataFrame = {
    val lines = body.split("\n").iterator.map(_.stripLineEnd).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, "bar endpoint returned an empty body")
    val header = lines.head.split(",", -1).toSeq
    require(header.headOption.contains("ts"),
      s"bar CSV must lead with a ts column, got: ${header.take(3).mkString(",")}")
    val schema = StructType(
      StructField("ts", TimestampType, nullable = false) +:
        header.tail.map(c => StructField(c, DoubleType, nullable = true)))
    val rows: Seq[Row] = lines.tail.map { line =>
      val cells = line.split(",", -1)
      require(cells.length == header.length,
        s"bar CSV row has ${cells.length} cells, header has ${header.length}")
      val ts = parseInstant(cells(0))
      val vals = cells.tail.map { c =>
        if (c.isEmpty) null
        else
          try java.lang.Double.valueOf(c.toDouble)
          catch { case _: NumberFormatException => null }
      }
      Row.fromSeq(java.sql.Timestamp.from(ts) +: vals.toSeq)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  private def parseInstant(s: String): Instant = BarCsv.parseInstant(s)

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
}

/** Shared bar-CSV primitives for the driver-side ([[HttpBarSource]]) and
  * distributed ([[graft.sources.BarDataSource]]) readers of the same vendor
  * contract.
  */
private[graft] object BarCsv {
  /** ISO-8601 instant (`2025-04-17T07:00:00Z`), or a tz-less
    * `yyyy-MM-dd[ T]HH:mm:ss` read as UTC (the vendor's daily-bar shape —
    * [[Standardizer.toUtc]]'s sourceTz branch owns real localization).
    */
  def parseInstant(s: String): Instant =
    try Instant.parse(s)
    catch {
      case _: java.time.format.DateTimeParseException =>
        LocalDateTime.parse(s.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
    }
}
