package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: ad-hoc timing experiments at a given SF.
  * Current experiment: e7_correlation — the self-joined `daily` aggregate is
  * built twice (the two join branches carry different pushed filters, so
  * ReuseExchange can't dedupe them); does materializing it once pay?
  * Both variants run the PRODUCTION e7 body (`e7CorrelationFrom`) so the
  * comparison stays valid if the query evolves.
  */
object ProfileMisc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-34s min=${times.min}%6.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }

    graft.Tables(spark, dir, "events").count()

    def daily: DataFrame = graft.Tables(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(expr("max_by(value, ts)").as("close"))

    time("e7 current (recomputed daily)")(graft.queries.CoreQueries.e7Correlation(spark, dir))
    time("e7 localCheckpoint daily")(
      graft.queries.CoreQueries.e7CorrelationFrom(daily.localCheckpoint()))
    spark.stop()
  }
}
