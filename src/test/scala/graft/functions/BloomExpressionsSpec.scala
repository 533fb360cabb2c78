package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BloomExpressionsSpec extends SparkSuite {

  test("bloom probe: no false negatives, null probes false, parity with mightContainString") {
    import spark.implicits._
    val present = (0 until 500).map(i => s"digest_$i")
    val bf = present.toDF("h").stat.bloomFilter("h", 500L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val probe = BloomExpressions.registerProbe(spark, bfB)

    val mixed = (present ++ (0 until 500).map(i => s"absent_$i")).map(Option(_)) :+
      (None: Option[String])
    val got = mixed.toDF("h")
      .withColumn("hit", expr(s"$probe(h)"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getBoolean(1))

    got.foreach {
      case (None, hit) => assert(!hit, "NULL must probe false")
      case (Some(s), hit) =>
        // exact parity with the string lane the sketch was built through
        assert(hit == bf.mightContainString(s), s"parity broke on $s")
        if (present.contains(s)) assert(hit, s"false negative on $s")
    }
    // the 1% fpp filter must reject the bulk of the absent keys (sanity
    // that the probe actually consults the sketch, not a constant)
    val absentHits = got.collect { case (Some(s), hit) if s.startsWith("absent_") && hit => s }
    assert(absentHits.length < 50, s"absent-key hit rate implausible: $absentHits")
  }

  test("bloom probe: evaluates identically with codegen disabled (interpreted eval path)") {
    import spark.implicits._
    val bf = Seq("a", "b", "c").toDF("h").stat.bloomFilter("h", 3L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val probe = BloomExpressions.registerProbe(spark, bfB)
    val df = Seq(Some("a"), Some("zzz"), None).toDF("h")
      .withColumn("hit", expr(s"$probe(h)"))
    val withCodegen = df.collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toSeq
    val prevWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val prevFm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.collect().map(r => Option(r.getString(0)) -> r.getBoolean(1)).toSeq
      assert(withCodegen == interpreted)
    } finally {
      prevWs.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      prevFm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
