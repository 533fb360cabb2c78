package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump schemas + row counts of every testdata table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n =>
      try {
        val df = spark.read.parquet(s"$dir/$n.parquet")
        println(s"== $n  rows=${df.count()}")
        df.printSchema()
        df.show(2, truncate = 60)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
