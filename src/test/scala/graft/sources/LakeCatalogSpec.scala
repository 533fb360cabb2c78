package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.SnapshotLake

/** The lake's SQL face: SELECT through the catalog equals the API read,
  * VERSION/TIMESTAMP AS OF equal readAt, snapshot pinning holds across a
  * later commit, pushdown reaches the parquet scan, and the catalog
  * refuses writes.
  */
class LakeCatalogSpec extends SparkSuite {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft_lakecat").toString
  spark.conf.set("spark.sql.catalog.glake", classOf[LakeCatalog].getName)
  spark.conf.set("spark.sql.catalog.glake.root", root)

  private val b1 = Seq(
    ("k1", "2025-01-01", 1L, 10.0),
    ("k2", "2025-01-02", 1L, 20.0),
    ("k3", "2025-01-03", 1L, 30.0)).toDF("key", "dt", "v", "price")
  private val b2 = Seq(
    ("k1", "2025-01-01", 2L, 15.0),
    ("k4", "2025-01-04", 1L, 40.0)).toDF("key", "dt", "v", "price")

  private def state(rows: Array[org.apache.spark.sql.Row]): Map[String, (Long, Double)] =
    rows.map(r => r.getAs[String]("key") ->
      ((r.getAs[Long]("v"), r.getAs[Double]("price")))).toMap

  test("SELECT through the catalog ≡ SnapshotLake.read; VERSION AS OF ≡ readAt") {
    val dir = s"$root/quotes"
    SnapshotLake.merge(spark, dir, b1, Seq("key"), "v", "dt")
    SnapshotLake.merge(spark, dir, b2, Seq("key"), "v", "dt")
    val viaSql = state(spark.sql("SELECT * FROM glake.quotes").collect())
    assert(viaSql == state(SnapshotLake.read(spark, dir).collect()))
    assert(viaSql == Map("k1" -> ((2L, 15.0)), "k2" -> ((1L, 20.0)),
      "k3" -> ((1L, 30.0)), "k4" -> ((1L, 40.0))))
    // time travel to the first commit
    val v1 = state(spark.sql("SELECT * FROM glake.quotes VERSION AS OF 1").collect())
    assert(v1 == state(SnapshotLake.readAt(spark, dir, 1L).collect()))
    assert(v1 == Map("k1" -> ((1L, 10.0)), "k2" -> ((1L, 20.0)), "k3" -> ((1L, 30.0))))
    // TIMESTAMP AS OF "now" resolves the newest snapshot
    val nowIso = java.time.Instant.now().plusSeconds(60).toString
    val byTs = state(spark.sql(
      s"SELECT * FROM glake.quotes TIMESTAMP AS OF '$nowIso'").collect())
    assert(byTs == viaSql)
    // catalog listing sees the table
    assert(spark.sql("SHOW TABLES IN glake").collect()
      .map(_.getAs[String]("tableName")).contains("quotes"))
  }

  test("filter/column pushdown reach the parquet scan through the catalog") {
    val dir = s"$root/pushed"
    SnapshotLake.merge(spark, dir, b1, Seq("key"), "v", "dt")
    val df = spark.sql("SELECT key, price FROM glake.pushed WHERE price > 15.0")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(price"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("dt:"),
      s"unused columns not pruned:\n$scan")
    assert(df.collect().map(_.getString(0)).toSet == Set("k2", "k3"))
  }

  test("a resolved SQL snapshot stays pinned across a later commit") {
    val dir = s"$root/pinned"
    SnapshotLake.merge(spark, dir, b1, Seq("key"), "v", "dt")
    val pinned = spark.sql("SELECT * FROM glake.pinned").localCheckpoint()
    SnapshotLake.merge(spark, dir, b2, Seq("key"), "v", "dt")
    assert(state(pinned.collect()) == state(SnapshotLake.readAt(spark, dir, 1L).collect()),
      "a pre-commit SQL reader's snapshot changed under it")
    assert(state(spark.sql("SELECT * FROM glake.pinned").collect()).size == 4)
  }

  test("stats sidecars prune FILES at SQL scan time (pushed filters)") {
    val dir = s"$root/sliced"
    val rows = (1 to 1000).map(i => (s"k$i", "p", i.toLong, i.toDouble))
      .toDF("key", "dt", "v", "price")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try SnapshotLake.merge(spark, dir, rows, Seq("key"), "v", "dt",
      statsCols = Seq("v"))
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = SnapshotLake.currentManifest(spark, dir).get
    val genDir = new org.apache.hadoop.fs.Path(s"$dir/data/" +
      m.entries.head.dirName + s"/gen=${m.entries.head.gen}")
    val total = fs.listStatus(genDir)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(total > 2, s"need fragmentation, got $total")
    // a narrow v-slice THROUGH SQL must read fewer files than the
    // partition holds — the pushed conjuncts hit the sidecars before the
    // parquet file index ever lists the rest
    val q = spark.sql(
      "SELECT key, v, input_file_name() AS f FROM glake.sliced " +
        "WHERE v >= 100 AND v <= 200")
    assert(q.count() == 101)
    assert(q.select("f").distinct().count() < total,
      "SQL scan read every file — pushdown pruning is dead")
    // results identical to the unpruned read + filter
    val want = SnapshotLake.read(spark, dir)
      .filter(col("v") >= 100L && col("v") <= 200L)
      .select("key", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(q.select("key", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == want)
    // row-group pushdown still reaches the parquet scan underneath
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(v"), s"parquet pushdown lost:\n$plan")
    // an unfiltered scan reads everything
    assert(spark.sql("SELECT count(*) FROM glake.sliced").collect()
      .head.getLong(0) == 1000L)
  }

  test("read-only: DDL/DML through the catalog refuse loudly; missing tables throw") {
    intercept[UnsupportedOperationException](
      spark.sql("CREATE TABLE glake.t2 (a INT) USING parquet"))
    intercept[UnsupportedOperationException](spark.sql("DROP TABLE glake.quotes"))
    val e = intercept[Exception](spark.sql("SELECT * FROM glake.absent").collect())
    assert(e.getMessage.contains("absent") || e.getMessage.contains("TABLE_OR_VIEW"))
  }
}
