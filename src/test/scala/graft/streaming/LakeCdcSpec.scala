package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.SnapshotLake

/** The standing CDC consumer ([[LakeChangeFeed]]): multi-commit history
  * delivered in order and exactly once across restarts, the bootstrap
  * snapshot, crash-replay suppression, the vacuum guardrail, and the
  * exactly-once composition with the fold ledger.
  */
class LakeCdcSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(slot: String): String =
    Files.createTempDirectory(s"graft_cdc_$slot").toString

  private val b1 = Seq(
    ("k1", "2025-01-01", 1L, 10.0),
    ("k2", "2025-01-02", 1L, 20.0)).toDF("key", "dt", "v", "price")
  private val b2 = Seq(
    ("k1", "2025-01-01", 2L, 15.0),
    ("k3", "2025-01-03", 1L, 30.0)).toDF("key", "dt", "v", "price")

  private def types(df: DataFrame): Map[String, String] =
    df.collect().map(r =>
      r.getAs[String]("key") -> r.getAs[String]("_change_type")).toMap

  test("follow: bootstrap + per-commit deltas, in order, exactly once across restarts") {
    val root = tmp("follow")
    val lake = s"$root/t"; val consumer = s"$root/c"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1
    SnapshotLake.merge(spark, lake, b2, Seq("key"), "v", "dt") // gen 2
    SnapshotLake.delete(spark, lake, col("key") === "k2")      // gen 3
    var got = List.empty[(Long, Map[String, String])]
    val f = (df: DataFrame, g: Long) => { got :+= ((g, types(df))); () }
    // tick 1: bootstrap (gen 1 as all-insert) + the two later deltas
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer, f)
      == Seq(1L, 2L, 3L))
    assert(got == List(
      (1L, Map("k1" -> "insert", "k2" -> "insert")),
      (2L, Map("k1" -> "update", "k3" -> "insert")),
      (3L, Map("k2" -> "delete"))))
    // tick 2 (a "restart" — position is durable markers, not process state):
    // caught up, nothing re-delivered
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer, f).isEmpty)
    assert(got.length == 3)
    // a new commit arrives: exactly its delta is delivered
    SnapshotLake.merge(spark, lake,
      Seq(("k4", "2025-01-04", 1L, 40.0)).toDF("key", "dt", "v", "price"),
      Seq("key"), "v", "dt") // gen 4
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer, f)
      == Seq(4L))
    assert(got.last == ((4L, Map("k4" -> "insert"))))
    assert(LakeChangeFeed.lastConsumedGen(spark, consumer).contains(4L))
  }

  test("crash inside f: the unmarkered batch replays once, then suppression holds") {
    val root = tmp("crash")
    val lake = s"$root/t"; val consumer = s"$root/c"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1
    SnapshotLake.merge(spark, lake, b2, Seq("key"), "v", "dt") // gen 2
    var seen = List.empty[Long]
    // consumer dies mid-gen-2 (after the bootstrap markered)
    intercept[RuntimeException] {
      LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, g) => {
        seen :+= g
        if (g == 2L) throw new RuntimeException("crash before marker")
      })
    }
    assert(seen == List(1L, 2L))
    assert(LakeChangeFeed.lastConsumedGen(spark, consumer).contains(1L),
      "the crashed batch must NOT be markered")
    // the restarted tick re-delivers ONLY gen 2 (bootstrap suppressed)
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer,
      (_, g) => seen :+= g) == Seq(2L))
    assert(seen == List(1L, 2L, 2L))
  }

  test("vacuum guardrail: a consumer outrun by retention fails loudly, naming the gen") {
    val root = tmp("vac")
    val lake = s"$root/t"; val consumer = s"$root/c"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1
    // consume up to gen 1
    LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => ())
    SnapshotLake.merge(spark, lake, b2, Seq("key"), "v", "dt") // gen 2
    SnapshotLake.delete(spark, lake, col("key") === "k2")      // gen 3
    SnapshotLake.vacuum(spark, lake, keepManifests = 1)        // only gen 3 left
    val e = intercept[IllegalStateException] {
      LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => ())
    }
    assert(e.getMessage.contains("snapshot 1") &&
      e.getMessage.contains("no longer retained"),
      s"error must name the missing snapshot, got: ${e.getMessage}")
    // a RESET consumer re-bootstraps from the oldest retained snapshot
    val consumer2 = s"$root/c2"
    var got = List.empty[(Long, Long)]
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer2,
      (df, g) => got :+= ((g, df.count()))) == Seq(3L))
    assert(got == List((3L, 2L))) // k1 + k3 as the bootstrap inserts
  }

  test("reset guardrail: a re-created lake fails the follower instead of silently skipping") {
    val root = tmp("reset")
    val lake = s"$root/t"; val consumer = s"$root/c"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1
    SnapshotLake.merge(spark, lake, b2, Seq("key"), "v", "dt") // gen 2
    LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => ())
    // the lake is deleted and re-created at the same path: its generation
    // counter resets BELOW the consumer's position — "caught up" would be
    // a silent skip of the new table's entire history
    val fs = new org.apache.hadoop.fs.Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(lake), true)
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1 again
    val e = intercept[IllegalStateException] {
      LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => ())
    }
    assert(e.getMessage.contains("reset"),
      s"error must name the lake reset, got: ${e.getMessage}")
  }

  test("exactly-once end-to-end: follower composed with the atomic fold ledger") {
    val root = tmp("fold")
    val lake = s"$root/t"; val consumer = s"$root/c"
    val mv = s"$root/mv"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt") // gen 1
    SnapshotLake.merge(spark, lake, b2, Seq("key"), "v", "dt") // gen 2
    // MV: running SUM of post-image prices per key (sum-merge — NOT
    // idempotent, so replay suppression must be the fold ledger's)
    def fold(delta: DataFrame, gen: Long): Unit = {
      StreamingIngest.foldStateBatchOnce(
        delta.filter(col("_change_type") =!= "delete"), gen, mv, "cdc-mv",
        b => b.groupBy(col("key")).agg(sum(col("price")).as("s")),
        (cur, bs) => cur.unionByName(bs)
          .groupBy(col("key")).agg(sum(col("s")).as("s")))
      ()
    }
    LakeChangeFeed.followAvailableNow(spark, lake, consumer, fold)
    val once = spark.read.parquet(mv).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("s")).toMap
    assert(once == Map("k1" -> 25.0, "k2" -> 20.0, "k3" -> 30.0))
    // simulate a LOST consumer position (markers wiped): the re-delivered
    // generations land in the SAME fold-ledger namespace and are suppressed
    // — the MV never double-counts
    val fs = new org.apache.hadoop.fs.Path(consumer).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(consumer), true)
    assert(LakeChangeFeed.followAvailableNow(spark, lake, consumer, fold)
      == Seq(1L, 2L))
    val twice = spark.read.parquet(mv).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("s")).toMap
    assert(twice == once, "replayed generations must not re-fold")
  }

  test("concurrent ticks on one consumer dir: the second aborts on the lease") {
    val root = tmp("lease")
    val lake = s"$root/t"; val consumer = s"$root/c"
    SnapshotLake.merge(spark, lake, b1, Seq("key"), "v", "dt")
    @volatile var second: Option[Throwable] = None
    val inF = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      try LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => {
        inF.countDown(); release.await()
      })
      catch { case e: Throwable => second = Some(e) }
    })
    t.start(); inF.await()
    val e = intercept[graft.etl.LakeLease.LeaseHeldException] {
      LakeChangeFeed.followAvailableNow(spark, lake, consumer, (_, _) => ())
    }
    assert(e.getMessage.contains("single-writer"))
    release.countDown(); t.join()
    assert(second.isEmpty)
  }
}
