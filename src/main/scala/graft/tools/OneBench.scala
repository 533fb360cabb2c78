package graft.tools
import org.apache.spark.sql.SparkSession
object OneBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        println(s"$q rep$i: ${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
