package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Storage-layout proofs: partition pruning actually prunes, bucketed joins
  * actually skip the exchange, salted joins preserve semantics.
  */
class LayoutSpec extends SparkSuite {

  private lazy val work = Files.createTempDirectory("graft_layout").toString

  test("partitioned sink: date filter prunes partitions at the scan") {
    val path = s"$work/events_by_day"
    val ev = Tables(spark, sf001, "events")
      .withColumn("dt", to_date(col("ts")))
    Layout.writePartitioned(ev, path, Seq("dt"))
    val days = spark.read.parquet(path).select("dt").distinct().count()
    assert(days > 1)
    val one = spark.read.parquet(path).filter(col("dt") === "2024-01-05")
    val p = one.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    // pruned scan must read a single partition directory
    val scanned = one.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.nonEmpty && scanned.head == 1,
      s"expected 1 partition scanned, got $scanned of $days")
  }

  test("bucketed tables: co-located join plans with zero exchanges") {
    val o = Tables(spark, sf001, "orders")
    val li = Tables(spark, sf001, "lineitem")
    // the in-memory catalog is per-JVM but the warehouse dir persists:
    // remove orphan locations from previous runs before recreating
    Seq("orders_b", "lineitem_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Layout.writeBucketed(o, "orders_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    Layout.writeBucketed(li, "lineitem_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "l_linenumber", "l_extendedprice")
    val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), "bucketed join still shuffles:\n" + p)
    // and it computes the same thing as the unbucketed join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("salted join equals the plain join") {
    val li = Tables(spark, sf001, "lineitem")
    val supp = Tables(spark, sf001, "supplier")
    val plain = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
    val salted = Layout.saltedEquiJoin(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), supp,
        keys = Seq("s_suppkey"), buckets = 8,
        saltSource = col("l_orderkey") * 10 + col("l_linenumber"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
