package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)
    val dir = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"########## $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect() // materialize THIS queryExecution so AQE finalizes the plan
      val fin = df.queryExecution.executedPlan.toString
      val globalWindows = graft.plans.PlanChecks.unboundedGlobalWindows(df)
      println(s"  exchanges=${"Exchange hashpartitioning".r.findAllIn(fin).length}" +
        s" reused=${"ReusedExchange".r.findAllIn(fin).length}" +
        s" scans=${"FileScan parquet".r.findAllIn(fin).length}" +
        s" bhj=${"BroadcastHashJoin".r.findAllIn(fin).length}" +
        s" smj=${"SortMergeJoin".r.findAllIn(fin).length}" +
        s" unboundedGlobalWindows=${globalWindows.length}")
      if (globalWindows.nonEmpty)
        println(s"  !! one-task Window over unbounded input — see graft.operators.Ranking")
      println(fin)
    }
    spark.stop()
  }
}
