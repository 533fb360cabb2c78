package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolate the x9c FOLD cost from the gate query's staging.
  * The declared x9c query pays build(b1) + fold(b2) to prove the law; a
  * production admission loop pays only the fold. This times the three
  * lanes separately at a chosen scale dir (default the 10× replicas).
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)
    import graft.dedup.DedupQueries
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fold_probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val docs = graft.Tables(spark, dir, "documents")
    val pairs = time("x4 pairs (materialize)") {
      DedupQueries.x4Pairs(docs).select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
    }
    // a production-shaped split: a 5% admission batch into a 95% corpus
    // (the gate query's 50/50 split exists to prove the law, not the cost)
    val inBase = col("doc_id") % 20 =!= 19
    val bothBase = col("doc_a") % 20 =!= 19 && col("doc_b") % 20 =!= 19
    val base = time("build(95% base)") {
      DedupQueries.x9ClustersFrom(docs.filter(inBase), pairs.filter(bothBase))
        .localCheckpoint()
    }
    val folded = time("fold(5% batch) ONLY") {
      DedupQueries.x9cFoldClusters(base,
        docs.filter(!inBase), pairs.filter(!bothBase)).localCheckpoint()
    }
    time("x9 full recompute") {
      DedupQueries.x9ClustersFrom(docs, pairs).localCheckpoint()
    }
    println(s"[fold_probe] folded rows: ${folded.count()}")
    spark.stop()
  }
}
