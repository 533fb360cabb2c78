package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: ad-hoc timing experiments at a given SF.
  * Current experiment: e7_correlation — the self-joined `daily` aggregate is
  * built twice (the two join branches carry different pushed filters, so
  * ReuseExchange can't dedupe them); does materializing it once pay?
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

    def dsum30(c: Column): Column = sum(c.cast("decimal(30,8)")).cast("double")

    def corrFrom(daily: DataFrame): DataFrame = {
      val joined = daily.filter(col("user_id") < 50).as("a")
        .join(daily.as("b"),
          col("a.day") === col("b.day") && col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("u1"), col("b.user_id").as("u2"),
          col("a.close").as("x"), col("b.close").as("y"))
      joined
        .groupBy(col("u1"), col("u2"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsum30(col("x")).as("sx"), dsum30(col("y")).as("sy"),
          dsum30(col("x") * col("y")).as("sxy"),
          dsum30(col("x") * col("x")).as("sxx"),
          dsum30(col("y") * col("y")).as("syy"))
        .filter(col("n") >= 20)
        .select(col("u1"), col("u2"), col("n").cast("long").as("n_days"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy")))).as("pearson_r"))
        .orderBy("u1", "u2")
    }

    def daily: DataFrame = graft.Tables(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(expr("max_by(value, ts)").as("close"))

    time("e7 current (recomputed daily)")(graft.queries.CoreQueries.e7Correlation(spark, dir))
    time("e7 localCheckpoint daily")(corrFrom(daily.localCheckpoint()))
    spark.stop()
  }
}
