package graft.sources

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.SparkException

import graft.SparkSuite
import graft.etl.{BarIngest, HttpBarSource, HttpTransport, IndexMeta}

/** Distributed (DataSourceV2) bar source: partition-per-ticker-batch fetch,
  * per-partition validation and retry, and equivalence with the driver-side
  * [[HttpBarSource]] path on the same vendor contract.
  */
class BarV2SourceSpec extends SparkSuite {
  import spark.implicits._

  /** Thread-safe URL-routed transport: V2 partitions fetch concurrently, so
    * responses route by which ticker batch the URL names (call ORDER across
    * partitions is nondeterministic — an ordered script would flake).
    * Each route's responders are consumed in sequence, so a route can
    * script fail-fail-succeed.
    */
  final class RoutedTransport(routes: (String, Seq[String => String])*)
      extends HttpTransport {
    val calls = new ConcurrentHashMap[String, Integer]()
    private val remaining =
      mutable.Map(routes.map { case (k, rs) => k -> mutable.Queue(rs: _*) }: _*)

    def callCount(routeKey: String): Int =
      calls.getOrDefault(routeKey, 0).intValue()

    def get(url: String, timeoutMillis: Int): String = synchronized {
      val key = routes.map(_._1).find(url.contains)
        .getOrElse(sys.error(s"no route for $url"))
      calls.merge(key, 1, (a, b) => a + b)
      val q = remaining(key)
      // the LAST responder is sticky: every Spark ACTION refetches a live
      // source (collect, then a filter().collect(), then the adapter's
      // pivot jobs), so the steady-state response must replay — only the
      // leading failure script is consumed
      (if (q.size > 1) q.dequeue() else q.head)(url)
    }
  }

  private def ok(body: String): String => String = _ => body
  private def boom(msg: String): String => String =
    _ => throw new java.io.IOException(msg)

  private def csvFor(tickers: Seq[String]): String = {
    val fields = Seq("Open", "High", "Low", "Close", "Adj Close", "Volume")
    val header = "ts" +: tickers.flatMap(t => fields.map(f => s"$t:$f"))
    val row = (i: Int) =>
      s"2025-04-17T0$i:00:00Z" +: tickers.flatMap(t =>
        fields.map(f => (100.0 + t.length + i + f.length).toString))
    (header +: Seq(row(1), row(2))).map(_.mkString(",")).mkString("\n")
  }

  private def registered[A](name: String, t: HttpTransport)(body: => A): A =
    try { TransportRegistry.register(name, t); body }
    finally TransportRegistry.unregister(name)

  lazy val dim = Seq(
    IndexMeta("AAA", "A index", "Germany", "XETRA", "EUR"),
    IndexMeta("BBB", "B index", "United Kingdom", "LSE", "GBP"),
    IndexMeta("CCC", "C index", "Japan", "JPX", "JPY"),
    IndexMeta("DDD", "D index", "Germany", "XETRA", "EUR"),
    IndexMeta("EEE", "E index", "France", "Euronext", "EUR")).toDF()

  test("partition per ticker batch: 5 tickers / batchSize 2 → 3 independent fetches") {
    val t = new RoutedTransport(
      "tickers=AAA%2CBBB" -> Seq(ok(csvFor(Seq("AAA", "BBB")))),
      "tickers=CCC%2CDDD" -> Seq(ok(csvFor(Seq("CCC", "DDD")))),
      "tickers=EEE" -> Seq(ok(csvFor(Seq("EEE")))))
    registered("routed-3batch", t) {
      val df = spark.read.format(classOf[BarDataSource].getName)
        .option("baseUrl", "http://bars.test")
        .option("tickers", "AAA,BBB,CCC,DDD,EEE")
        .option("batchSize", "2")
        .option("transport", "routed-3batch")
        .load()
      assert(df.rdd.getNumPartitions == 3, "one InputPartition per ticker batch")
      val rows = df.collect() // ONE action: one fetch per batch partition
      // 5 tickers × 6 fields × 2 timestamps
      assert(rows.length == 5 * 6 * 2)
      assert(t.callCount("tickers=AAA%2CBBB") == 1)
      assert(t.callCount("tickers=CCC%2CDDD") == 1)
      assert(t.callCount("tickers=EEE") == 1)
      val aaaClose = rows.filter(r => r.getString(1) == "AAA" && r.getString(2) == "Close" &&
        r.getTimestamp(0) == Timestamp.valueOf("2025-04-17 01:00:00"))
      assert(aaaClose.length == 1 && aaaClose.head.getDouble(3) == 109.0)
    }
  }

  test("partition-level retry: one flaky batch recovers without refetching the others") {
    val t = new RoutedTransport(
      "tickers=AAA%2CBBB" -> Seq(ok(csvFor(Seq("AAA", "BBB")))),
      "tickers=CCC" -> Seq(boom("reset"), boom("reset"), ok(csvFor(Seq("CCC")))))
    registered("routed-flaky", t) {
      val df = spark.read.format(classOf[BarDataSource].getName)
        .option("baseUrl", "http://bars.test")
        .option("tickers", "AAA,BBB,CCC")
        .option("batchSize", "2")
        .option("maxAttempts", "3")
        .option("transport", "routed-flaky")
        .load()
      assert(df.count() == 3 * 6 * 2)
      assert(t.callCount("tickers=CCC") == 3, "two transient failures absorbed in-task")
      assert(t.callCount("tickers=AAA%2CBBB") == 1, "healthy batch fetched once")
    }
  }

  test("partition hard failure: a batch down past maxAttempts fails the read loudly") {
    val t = new RoutedTransport(
      "tickers=AAA" -> Seq(boom("down"), boom("down")))
    registered("routed-down", t) {
      val df = spark.read.format(classOf[BarDataSource].getName)
        .option("baseUrl", "http://bars.test")
        .option("tickers", "AAA")
        .option("maxAttempts", "2")
        .option("transport", "routed-down")
        .load()
      val e = intercept[SparkException] { df.collect() }
      assert(e.getMessage.contains("down") ||
        Option(e.getCause).exists(_.getMessage.contains("down")))
    }
  }

  test("per-partition empty-data hard fail: a batch serving none of its tickers") {
    val t = new RoutedTransport(
      "tickers=AAA" -> Seq(ok("ts,ZZZ:Close\n2025-04-17T01:00:00Z,1.0")))
    registered("routed-empty", t) {
      val df = spark.read.format(classOf[BarDataSource].getName)
        .option("baseUrl", "http://bars.test")
        .option("tickers", "AAA")
        .option("transport", "routed-empty")
        .load()
      val e = intercept[SparkException] { df.collect() }
      assert(e.getMessage.contains("no <ticker>:<field> columns") ||
        Option(e.getCause).exists(_.getMessage.contains("no <ticker>:<field> columns")))
    }
  }

  test("unrequested vendor columns are pruned per partition; empty/bad cells are null") {
    val csv =
      """ts,AAA:Close,AAA:Open,ZZZ:Close
        |2025-04-17T01:00:00Z,101.5,,9
        |2025-04-17T02:00:00Z,bad,102.5,9""".stripMargin
    val t = new RoutedTransport("tickers=AAA" -> Seq(ok(csv)))
    registered("routed-prune", t) {
      val df = spark.read.format(classOf[BarDataSource].getName)
        .option("baseUrl", "http://bars.test")
        .option("tickers", "AAA")
        .option("transport", "routed-prune")
        .load()
      val rows = df.collect()
      assert(rows.forall(_.getString(1) == "AAA"), "ZZZ must not leak")
      assert(rows.length == 4) // 2 ts × 2 AAA fields
      val byKey = rows.map(r => (r.getTimestamp(0).toString, r.getString(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(byKey(("2025-04-17 01:00:00.0", "Close")).contains(101.5))
      assert(byKey(("2025-04-17 01:00:00.0", "Open")).isEmpty) // empty cell
      assert(byKey(("2025-04-17 02:00:00.0", "Close")).isEmpty) // unparsable
    }
  }

  test("V2 wide adapter ≡ driver-side HttpBarSource on the same vendor response") {
    val csv = csvFor(Seq("AAA", "BBB"))
    val routed = new RoutedTransport("tickers=AAA%2CBBB" -> Seq(ok(csv)))
    registered("routed-equiv", routed) {
      val v2 = new V2BarSource("http://bars.test", transportName = "routed-equiv")
        .fetchWide(spark, Seq("AAA", "BBB"), "7d", "60m")
      val scripted = new HttpBarSource(
        new HttpTransport { def get(u: String, t: Int): String = csv },
        "http://bars.test")
        .fetchWide(spark, Seq("AAA", "BBB"), "7d", "60m")
      assert(v2.columns.sorted.toSeq == scripted.columns.sorted.toSeq)
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.orderBy("ts").collect().map(r =>
          df.columns.sorted.map(c => String.valueOf(r.get(r.fieldIndex(c)))).mkString("|")).toSeq
      assert(key(v2) == key(scripted))
    }
  }

  test("S1 via V2: fetchStandardized runs the distributed path unchanged (e1 seam)") {
    val t = new RoutedTransport(
      "tickers=AAA%2CBBB" -> Seq(ok(csvFor(Seq("AAA", "BBB")))))
    registered("routed-e1", t) {
      val src = new V2BarSource("http://bars.test", transportName = "routed-e1")
      val std = BarIngest.fetchStandardized(spark, src, Seq("AAA", "BBB"), dim)
      assert(std.columns.toSeq == graft.etl.Schema.canonicalQuoteCols)
      assert(std.count() == 4) // 2 ts × 2 tickers
      val aaa = std.filter($"ticker" === "AAA" &&
        $"timestamp_utc" === Timestamp.valueOf("2025-04-17 01:00:00")).collect().head
      assert(aaa.getAs[String]("original_currency") == "EUR")
      assert(aaa.getAs[Double]("close") == 109.0)
    }
  }
}
