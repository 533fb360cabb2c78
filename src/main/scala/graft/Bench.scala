package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    // Warm JIT/codegen on every query plan at the smoke scale factor so the
    // measured sf run reflects data processing, not JVM startup (whole-stage
    // codegen compiles per plan shape; the first execution pays javac+JIT).
    val warmDir = "/root/testdata/sf0.001"
    Tables.all.foreach(n => Tables(spark, sfDir, n).count())
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      // Warmup failures are ignored here but resurface (and are recorded) in
      // the measured phase below.
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink: full evaluation of every operator (count() would let
      // Catalyst drop sorts and prune the projection being measured).
      // Best of three runs — GC/scheduler noise on a shared box otherwise
      // dominates sub-second queries. clearCache() between reps so one
      // query's (or rep's) persisted data can't distort another's number;
      // each rep measures the query fresh on a warm JVM.
      var err: Option[String] = None
      val times = (1 to 3).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(dt) else None
      }
      // A query that errored on ANY rep reports no time — a time + an error
      // for the same query would make bench_out.json ambiguous.
      (name, if (err.isEmpty && times.nonEmpty) Some(times.min) else None, err)
    }
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) =>
      jq(k) + ":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => jq(k) + ":" + jq(m) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // Regression gate against the committed per-query baseline
    // (BASELINE_BENCH.json, idle-host min-of-N): a query is flagged only
    // when BOTH the ratio exceeds the recorded noise factor AND the absolute
    // delta exceeds the floor — sub-second queries swing up to 2× on this
    // host from scheduler noise alone (SURVEY §6.2), so ratio alone
    // over-flags exactly the queries that matter least.
    val (ratios, flagged) = {
      // Baseline file selectable per scale point: the sf0.1 gate reads the
      // default; the committed 10×-replica artifact (BENCH_sf1.json) gates
      // against BASELINE_BENCH_sf1.json via this env var.
      val p = Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE_BENCH.json"))
      if (!Files.exists(p)) ("{}", Seq.empty[String])
      else {
        val b = org.json4s.jackson.JsonMethods.parse(Files.readString(p))
        import org.json4s.DefaultFormats
        implicit val fmts: org.json4s.Formats = DefaultFormats
        val noiseFactor = (b \ "noise_factor").extractOpt[Double].getOrElse(2.0)
        val absFloor = (b \ "abs_floor_sec").extractOpt[Double].getOrElse(1.0)
        val base = (b \ "queries").extractOpt[Map[String, Double]].getOrElse(Map.empty)
        val withBase = results.collect {
          case (k, Some(v), _) if base.contains(k) => (k, v, base(k))
        }
        val rj = withBase.map { case (k, v, b0) =>
          jq(k) + ":" + (math.round(v / b0 * 100.0) / 100.0)
        }.mkString("{", ",", "}")
        val fl = withBase.collect {
          case (k, v, b0) if v > noiseFactor * b0 && v - b0 > absFloor => k
        }
        (rj, fl)
      }
    }
    val flaggedJson = flagged.map(jq).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,""" +
        s""""vs_baseline":$ratios,"regressions":$flaggedJson,"sf":"$sfDir"}"""
    println(json)
    // Also write to a file so the driver never has to scrape the JSON out of
    // sbt's [info]/stderr noise.
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
    // A crashing query must fail the bench loudly, not record a fast fake
    // time and exit 0.
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
