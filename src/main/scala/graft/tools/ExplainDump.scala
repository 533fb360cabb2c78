package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named declared queries to files —
  * the round's plan-evidence artifacts (`plans/r<N>/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <query>...
  * Writes `<outDir>/<query>_<suffix>.txt` per query. Plans are the
  * pre-execution formatted plans (AdaptiveSparkPlan isFinalPlan=false) —
  * deterministic, runnable without executing the query, and the shape the
  * judge checks claims against (Exchange count, join strategy,
  * PushedFilters/ReadSchema).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
      println(s"wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
