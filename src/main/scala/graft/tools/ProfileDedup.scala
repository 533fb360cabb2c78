package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries

/** Dev utility: stage-by-stage timing of the dedup family at a given SF. */
object ProfileDedup {
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = graft.Tables(spark, dir, "documents")
    docs.count() // warm

    time("split only")(docs.select(col("doc_id"), split(col("text"), " ").as("ws")).count())
    time("explode, no distinct")(
      docs.withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          explode(expr("transform(sequence(1, size(ws) - 2), " +
            "i -> concat_ws(' ', slice(ws, i, 3)))")).as("shingle"))
        .count())
    time("explode repart32")(
      docs.repartition(32).withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          explode(expr("transform(sequence(1, size(ws) - 2), " +
            "i -> concat_ws(' ', slice(ws, i, 3)))")).as("shingle"))
        .count())
    val sh = DedupQueries.shingles(docs)
    time("shingles")(sh.count())
    val shc = sh.cache()
    time("shingles cached")(shc.count())
    time("minhash-agg only")(
      shc.withColumn("base",
          (conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long") % DedupQueries.P))
        .groupBy(col("doc_id"))
        .agg(min(col("base")).as("m0"),
          (1 until 24).map(k => min((col("base") * k) % DedupQueries.P).as(s"m$k")): _*)
        .count())

    def noop(df: DataFrame): Long = { df.write.mode("overwrite").format("noop").save(); 0L }
    time("x2 full")(noop(DedupQueries.x2MinhashLsh(spark, dir)))
    time("x3 full")(noop(DedupQueries.x3Simhash(spark, dir)))
    time("x4 full")(noop(DedupQueries.x4NgramJaccard(spark, dir)))
    spark.stop()
  }
}
