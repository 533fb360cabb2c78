package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: ad-hoc timing experiments at a given SF. */
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

    def time(name: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val ev = graft.Tables(spark, dir, "events")
    ev.count()

    time("window slide (current)")(graft.queries.CoreQueries.a12bSlidingWindow(spark, dir))
    time("window tumbling")(graft.queries.CoreQueries.a12TumblingWindow(spark, dir))
    time("slide agg only, no sort")(
      ev.groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n")))
    time("explode-2-starts variant")(
      ev.select(
          explode(array(date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"),
            date_trunc("hour", col("ts")))).as("ws"),
          col("event_type"), col("value"))
        .groupBy(col("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
        .orderBy("ws", "event_type"))
    spark.stop()
  }
}
