package graft.etl

import java.sql.{Date, Timestamp}

import scala.collection.mutable

import graft.SparkSuite

/** Offline coverage of the live-HTTP source implementations through a
  * scripted transport: retry, negative-cache, missing-column, and hard-fail
  * paths mirror the reference's semantics (`yf_collector.py:50-99`,
  * `currency_converter.py:44-105`).
  */
class HttpSourcesSpec extends SparkSuite {
  import spark.implicits._

  /** Plays back one scripted responder per call, records URLs; a responder
    * may throw to script a transport failure.
    */
  final class ScriptedTransport(responses: (String => String)*) extends HttpTransport {
    val calls = mutable.Buffer[String]()
    private var i = 0
    def get(url: String, timeoutMillis: Int): String = synchronized {
      calls += url
      require(i < responses.length, s"unscripted call #${i + 1}: $url")
      val r = responses(i)
      i += 1
      r(url)
    }
  }

  private def ok(body: String): String => String = _ => body
  private def boom(msg: String): String => String =
    _ => throw new java.io.IOException(msg)

  private val d17 = Date.valueOf("2025-04-17")
  private val d18 = Date.valueOf("2025-04-18")

  lazy val dim = Seq(
    IndexMeta("^GDAXI", "DAX", "Germany", "XETRA", "EUR"),
    IndexMeta("^FTSE", "FTSE 100", "United Kingdom", "LSE", "GBP")).toDF()

  test("HttpRateProvider: fetch, memoize, and frankfurter URL shape") {
    val t = new ScriptedTransport(
      ok("""{"amount":1.0,"base":"EUR","date":"2025-04-17","rates":{"USD":1.14}}"""))
    val p = new HttpRateProvider(t, baseUrl = "http://fx.test")
    val got = p.rates(Seq(("EUR", d17)), "USD")
    assert(got == Seq(FxRate("EUR", "USD", d17, 1.14)))
    assert(t.calls == Seq("http://fx.test/2025-04-17?from=EUR&to=USD"))
    // memoized: same pair again → no second request
    assert(p.rates(Seq(("EUR", d17)), "USD") == got)
    assert(t.calls.size == 1)
    // identity pair: 1.0 without any request (currency_converter.py:32-33)
    assert(p.rate("USD", "USD", d17).contains(1.0))
    assert(t.calls.size == 1)
  }

  test("HttpRateProvider: every failure class is a negative-cache miss") {
    val t = new ScriptedTransport(
      boom("connect timed out"), // transport failure
      ok("""{"rates":{"USD":null}}"""), // null rate (currency_converter.py:53-58)
      ok("""{"rates":{"GBP":0.79}}"""), // target absent from rates
      ok("""not json""")) // JSON decode error
    val p = new HttpRateProvider(t, baseUrl = "http://fx.test")
    assert(p.rate("EUR", "USD", d17).isEmpty)
    assert(p.rate("GBP", "USD", d17).isEmpty)
    assert(p.rate("JPY", "USD", d17).isEmpty)
    assert(p.rate("CHF", "USD", d17).isEmpty)
    assert(t.calls.size == 4)
    // all four are negative-cached: re-asking issues NO further requests
    // (the reference's CACHE_MISSES, currency_converter.py:36-39)
    assert(p.rates(Seq(("EUR", d17), ("GBP", d17), ("JPY", d17), ("CHF", d17)), "USD").isEmpty)
    assert(t.calls.size == 4)
  }

  test("HttpRateProvider: missing rates leave converted values null end to end") {
    val t = new ScriptedTransport(
      ok("""{"rates":{"USD":1.14}}"""),
      boom("HTTP 500")) // second pair's fetch fails → null close_usd
    val p = new HttpRateProvider(t, baseUrl = "http://fx.test")
    val quotes = Seq(
      ("^GDAXI", Timestamp.valueOf("2025-04-17 07:00:00"), "EUR", 100.0),
      ("^GDAXI", Timestamp.valueOf("2025-04-18 07:00:00"), "EUR", 200.0))
      .toDF("ticker", "timestamp_utc", "original_currency", "close")
    val out = CurrencyConverter.convertWithProvider(spark, quotes, p, "USD")
      .orderBy("timestamp_utc")
      .select("close_usd").collect()
    assert(out(0).getDouble(0) == 100.0 * 1.14)
    assert(out(1).isNullAt(0)) // README.md:381 missing-rate contract
    assert(t.calls.size == 2)
  }

  private val fullCsv =
    """ts,^GDAXI:Open,^GDAXI:High,^GDAXI:Low,^GDAXI:Close,^GDAXI:Adj Close,^GDAXI:Volume,^FTSE:Close
      |2025-04-17T07:00:00Z,20999.5,21002.5,20998.5,21000.5,21000.5,1000000,8200.25
      |2025-04-17T08:00:00Z,,bad,20999.5,21001.5,21001.5,1100000,8201.25""".stripMargin

  test("HttpBarSource: transient failure retries, then parses the wide CSV") {
    val t = new ScriptedTransport(boom("reset by peer"), ok(fullCsv))
    val src = new HttpBarSource(t, "http://bars.test", maxAttempts = 3)
    val wide = src.fetchWide(spark, Seq("^GDAXI", "^FTSE"), "7d", "60m")
    assert(t.calls.size == 2) // first attempt failed, second served
    assert(t.calls.head.startsWith("http://bars.test/bars?tickers="))
    assert(wide.count() == 2)
    val r = wide.orderBy("ts").collect()
    assert(r(0).getAs[Double]("^GDAXI:Close") == 21000.5)
    assert(r(1).isNullAt(wide.columns.indexOf("^GDAXI:Open"))) // empty cell
    assert(r(1).isNullAt(wide.columns.indexOf("^GDAXI:High"))) // unparsable cell
    // missing fields for ^FTSE surface exactly like the reference's warning
    assert(BarIngest.missingFields(wide, Seq("^GDAXI", "^FTSE")) ==
      Map("^FTSE" -> Set("Open", "High", "Low", "Adj Close", "Volume")))
  }

  test("HttpBarSource: hard-fails after maxAttempts (reference fetch-None path)") {
    val t = new ScriptedTransport(boom("down"), boom("down"), boom("down"))
    val src = new HttpBarSource(t, "http://bars.test", maxAttempts = 3)
    val e = intercept[java.io.IOException] {
      src.fetchWide(spark, Seq("^GDAXI"), "7d", "60m")
    }
    assert(e.getMessage == "down")
    assert(t.calls.size == 3)
  }

  test("HttpBarSource: prunes unrequested tickers; standardize composes end to end") {
    val csv = fullCsv.linesIterator.toSeq
    val withExtra = (csv.head + ",^NOISE:Close") +:
      csv.tail.map(_ + ",1.0")
    val t = new ScriptedTransport(ok(withExtra.mkString("\n")))
    val src = new HttpBarSource(t, "http://bars.test")
    val std = BarIngest.fetchStandardized(
      spark, src, Seq("^GDAXI", "^FTSE"), dim)
    assert(!std.columns.exists(_.contains("NOISE")))
    val gdaxi = std.filter($"ticker" === "^GDAXI" &&
      $"timestamp_utc" === Timestamp.valueOf("2025-04-17 07:00:00")).collect().head
    assert(gdaxi.getAs[Double]("close") == 21000.5)
    assert(gdaxi.getAs[String]("original_currency") == "EUR")
  }

  test("fetchStandardized rejects a fetch serving none of the requested tickers") {
    val t = new ScriptedTransport(
      ok("ts,^OTHER:Close\n2025-04-17T07:00:00Z,1.0"))
    val src = new HttpBarSource(t, "http://bars.test")
    val e = intercept[IllegalArgumentException] {
      BarIngest.fetchStandardized(spark, src, Seq("^GDAXI"), dim)
    }
    assert(e.getMessage.contains("no <ticker>:<field> columns"))
  }
}
