package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The binning optimizer rule must turn the nested-loop plan of a keyless
  * bounded-range join into an equi-join WITHOUT changing results — on the
  * DataFrame surface, on raw `spark.sql` text, and for negative epoch
  * values (the floor-division edge truncating division gets wrong).
  */
class RangeJoinBinningSpec extends SparkSuite {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBinningRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinBinningRule)
  }

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("keyless ts-window join: nested loop becomes an equi-join, results identical") {
    val ev = Tables(spark, sf001, "events")
    val half = 1800000000L
    def q: DataFrame = {
      val pts = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("us"))
      val iv = ev.filter(col("event_type") === "purchase" && col("value") >= 200)
        .select(col("event_id"), unix_micros(col("ts")).as("p_us"))
      iv.join(pts,
          col("us") >= col("p_us") - lit(half) && col("us") <= col("p_us") + lit(half))
        .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
        .orderBy("event_id")
    }
    val before = physical(q)
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      "fixture no longer exercises the nested-loop baseline:\n" + before)
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty)
    withRule {
      val after = physical(q)
      assert(!after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        "rule did not rewrite the range join:\n" + after)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, "binned rewrite changed the join result")
    }
  }

  test("raw spark.sql text gets the rewrite too") {
    Tables.registerViews(spark, sf001)
    def q = spark.sql(
      """SELECT i.event_id, COUNT(*) AS n
         FROM (SELECT event_id, unix_micros(ts) AS p_us FROM events
               WHERE event_type = 'purchase' AND value >= 200) i
         JOIN (SELECT unix_micros(ts) AS us FROM events
               WHERE event_type = 'click') p
           ON p.us >= i.p_us - 1800000000 AND p.us <= i.p_us + 1800000000
         GROUP BY i.event_id ORDER BY i.event_id""")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    withRule {
      assert(!physical(q).contains("BroadcastNestedLoopJoin"))
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)
    }
  }

  test("negative epoch values: floor-division bucketing stays exact") {
    import spark.implicits._
    // points and interval bases straddling zero, width 7 — truncating
    // division would mis-bucket every negative point
    val pts = (-40L to 40L).toDF("us")
    val iv = Seq(-35L, -8L, -1L, 0L, 3L, 29L).toDF("base")
    def q = iv.join(pts, col("us") >= col("base") - lit(3L) && col("us") <= col("base") + lit(4L))
      .groupBy(col("base")).agg(count(lit(1)).as("n"), sum(col("us")).as("s"))
      .orderBy("base")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    withRule {
      assert(!physical(q).contains("BroadcastNestedLoopJoin"))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"negative-domain rewrite diverged: $got vs $expected")
    }
  }

  test("TimestampType BETWEEN base ± INTERVAL gets the binned plan, results identical") {
    // the form raw-SQL users actually write against a timestamp column —
    // no manual unix_micros() anywhere; the rule must reach through
    // TimestampAddInterval and bin via UnixMicros
    val ev = Tables(spark, sf001, "events")
    def q: DataFrame = {
      val pts = ev.filter(col("event_type") === "click").select(col("ts"))
      val iv = ev.filter(col("event_type") === "purchase" && col("value") >= 200)
        .select(col("event_id"), col("ts").as("p_ts"))
      iv.join(pts,
          col("ts") >= col("p_ts") - expr("INTERVAL 30 MINUTE") &&
            col("ts") <= col("p_ts") + expr("INTERVAL 30 MINUTE"))
        .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
        .orderBy("event_id")
    }
    val before = physical(q)
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"),
      "fixture no longer exercises the nested-loop baseline:\n" + before)
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty)
    withRule {
      val after = physical(q)
      assert(!after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        "rule did not rewrite the timestamp range join:\n" + after)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, "timestamp rewrite changed the join result")
    }
  }

  test("raw SQL on the timestamp column: asymmetric interval bounds bin correctly") {
    Tables.registerViews(spark, sf001)
    def q = spark.sql(
      """SELECT i.event_id, COUNT(*) AS n
         FROM (SELECT event_id, ts FROM events
               WHERE event_type = 'purchase' AND value >= 200) i
         JOIN (SELECT ts AS c_ts FROM events WHERE event_type = 'click') p
           ON p.c_ts BETWEEN i.ts - INTERVAL 10 MINUTE
                         AND i.ts + INTERVAL 50 MINUTE
         GROUP BY i.event_id ORDER BY i.event_id""")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty)
    withRule {
      val after = physical(q)
      assert(!after.contains("BroadcastNestedLoopJoin") && !after.contains("CartesianProduct"),
        "raw-SQL timestamp join did not bin:\n" + after)
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)
    }
  }

  test("seeded fuzz: random widths/offsets/strictness match the nested-loop result") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val pts = (-500L to 500L).map(v => v * 7L).toDF("us").localCheckpoint()
    for (trial <- 1 to 12) {
      val bases = Seq.fill(40)(rnd.between(-3000L, 3000L)).distinct.toDF("base")
        .localCheckpoint()
      val lo = rnd.between(-200L, 100L)
      val hi = lo + rnd.between(0L, 400L)
      val strictLo = rnd.nextBoolean()
      val strictHi = rnd.nextBoolean()
      def cond = {
        val l = if (strictLo) col("us") > col("base") + lit(lo)
                else col("us") >= col("base") + lit(lo)
        val h = if (strictHi) col("us") < col("base") + lit(hi)
                else col("us") <= col("base") + lit(hi)
        l && h
      }
      def q = bases.join(pts, cond)
        .groupBy(col("base")).agg(count(lit(1)).as("n"), sum(col("us")).as("s"))
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      withRule {
        assert(!physical(q).contains("BroadcastNestedLoopJoin"),
          s"trial $trial (lo=$lo hi=$hi strict=($strictLo,$strictHi)) did not bin")
        val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expected,
          s"trial $trial (lo=$lo hi=$hi strict=($strictLo,$strictHi)) diverged")
      }
    }
  }

  test("equi-keyed range joins are left alone") {
    val ev = Tables(spark, sf001, "events")
    val pts = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u1"), unix_micros(col("ts")).as("us"))
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), unix_micros(col("ts")).as("p_us"))
    val q = iv.join(pts,
      col("u1") === col("u2") &&
        col("us") >= col("p_us") - lit(1800000000L) && col("us") <= col("p_us") + lit(1800000000L))
    withRule {
      assert(!physical(q).contains("__graft_range_bucket"),
        "rule fired on a join that already has an equi-key")
    }
  }
}
