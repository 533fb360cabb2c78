package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run a13 vs a13b on sf0.001 and diff, print the a13b plan. */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val a = graft.queries.CoreQueries.a13AsofJoin(spark, dir)
    val b = graft.queries.CoreQueries.a13bAsofJoinNative(spark, dir)
    println("=== a13b physical plan ===")
    println(b.queryExecution.executedPlan.toString.take(4000))
    val ra = a.collect()
    val rb = b.collect()
    println(s"a13 rows=${ra.length} a13b rows=${rb.length}")
    val diff = ra.zip(rb).filter { case (x, y) => x != y }
    println(s"mismatched rows: ${diff.length}")
    diff.take(5).foreach { case (x, y) => println(s"  a13=$x\n  a13b=$y") }
    spark.stop()
  }
}
