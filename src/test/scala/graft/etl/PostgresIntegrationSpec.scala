package graft.etl

import java.sql.{Date, DriverManager, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Executes the Postgres `Dialect` path — real ON CONFLICT statements,
  * reference trigger, TIMESTAMPTZ DDL — against a live server. Gated on the
  * `PG_URL` env var (a full JDBC URL, e.g.
  * `jdbc:postgresql://localhost/graft?user=graft&password=x`); without it
  * every test cancels, keeping offline runs green. The Derby suites cover
  * the same logic paths; this suite proves the Postgres SQL actually
  * executes where a daemon exists.
  */
class PostgresIntegrationSpec extends SparkSuite {
  import spark.implicits._

  private val pgUrl = sys.env.get("PG_URL")

  private def withPg[A](f: String => A): A = {
    assume(pgUrl.isDefined, "PG_URL not set — Postgres integration skipped")
    f(pgUrl.get)
  }

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  private def exec(url: String, sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { q => val st = c.createStatement(); try st.execute(q) finally st.close() }
    finally c.close()
  }

  private def queryRows[A](url: String, sql: String)(f: java.sql.ResultSet => A): Seq[A] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val out = Iterator.continually(rs).takeWhile(_.next()).map(f).toVector
      rs.close(); out
    } finally c.close()
  }

  private def resetDb(url: String): Unit = exec(url,
    "DROP TABLE IF EXISTS quotes CASCADE",
    "DROP TABLE IF EXISTS indices CASCADE",
    "DROP FUNCTION IF EXISTS update_updated_at_column() CASCADE")

  private lazy val dim = Seq(
    IndexMeta("^GDAXI", "DAX", "Germany", "XETRA", "EUR"),
    IndexMeta("^GSPC", "S&P 500", "USA", "NYSE", "USD")).toDF()

  private def mkBars(rows: Seq[(String, String, Double)]) =
    rows.toDF("ts_s", "ticker", "Close")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .withColumn("Open", $"Close" - 1.0)
      .withColumn("High", $"Close" + 2.0)
      .withColumn("Low", $"Close" - 2.0)
      .withColumn("Adj Close", $"Close")
      .withColumn("Volume", lit(1000L))

  private lazy val rates = new StaticRateProvider(Map(
    ("EUR", d("2025-04-17")) -> 1.14))

  test("Postgres DDL bootstrap is idempotent and installs the trigger") {
    withPg { url =>
      resetDb(url)
      val created = Ddl.createTables(url, Upsert.Postgres)
      assert(created.toSet == Set("indices", "quotes"))
      // second bootstrap: nothing missing, nothing re-run
      assert(Ddl.createTables(url, Upsert.Postgres).isEmpty)
      assert(queryRows(url,
        "SELECT COUNT(*) FROM pg_trigger WHERE tgname = 'update_indices_modtime'")(
        _.getLong(1)) == Seq(1L))
    }
  }

  test("Postgres composed load: converge on re-run, trigger stamps only real change") {
    withPg { url =>
      resetDb(url)
      val bars = mkBars(Seq(
        ("2025-04-17 07:00:00", "^GDAXI", 21000.5),
        ("2025-04-17 13:30:00", "^GSPC", 5300.75)))
      val m1 = Pipeline.runJdbc(spark, bars, dim, rates, url,
        ts("2025-05-01 00:00:00"), dialect = Upsert.Postgres)
      assert(m1.rows == 2 && m1.missingRate == 0)
      assert(queryRows(url, "SELECT COUNT(*) FROM quotes")(_.getLong(1)) == Seq(2L))
      val audit0 = queryRows(url,
        """SELECT "created_at", "updated_at" FROM indices WHERE "ticker" = '^GDAXI'""")(
        r => (r.getTimestamp(1), r.getTimestamp(2))).head

      // No-op replay: row-identical upsert — IS DISTINCT FROM in the trigger
      // must leave updated_at untouched (reference postgres_writer.py:53-73).
      Pipeline.runJdbc(spark, bars, dim, rates, url,
        ts("2025-05-02 00:00:00"), dialect = Upsert.Postgres)
      assert(queryRows(url, "SELECT COUNT(*) FROM quotes")(_.getLong(1)) == Seq(2L))
      val audit1 = queryRows(url,
        """SELECT "created_at", "updated_at" FROM indices WHERE "ticker" = '^GDAXI'""")(
        r => (r.getTimestamp(1), r.getTimestamp(2))).head
      assert(audit1 == audit0, "no-op replay must not advance audit stamps")

      // Real dimension change: trigger advances updated_at, created_at stays.
      val dim2 = Seq(
        IndexMeta("^GDAXI", "DAX 40", "Germany", "XETRA", "EUR"),
        IndexMeta("^GSPC", "S&P 500", "USA", "NYSE", "USD")).toDF()
      Pipeline.runJdbc(spark, bars, dim2, rates, url,
        ts("2025-05-03 00:00:00"), dialect = Upsert.Postgres)
      val audit2 = queryRows(url,
        """SELECT "created_at", "updated_at" FROM indices WHERE "ticker" = '^GDAXI'""")(
        r => (r.getTimestamp(1), r.getTimestamp(2))).head
      assert(audit2._1 == audit0._1, "created_at must never move")
      assert(audit2._2.after(audit1._2), "updated_at must advance on real change")

      // converted prices landed through the ON CONFLICT statement
      val usd = queryRows(url,
        """SELECT "close_usd" FROM quotes WHERE "ticker" = '^GDAXI'""")(_.getDouble(1))
      assert(usd == Seq(21000.5 * 1.14))
      resetDb(url)
    }
  }
}
