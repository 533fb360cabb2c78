package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Guardrails of the opt-in distributed ranking operator (its semantics are
  * covered by QueriesSpec's c8/c9 laws and the 10x twin gate).
  */
class RankingSpec extends SparkSuite {
  import spark.implicits._

  test("globalRank fails fast on a non-double-castable head key") {
    // a string head would cast to all-null, approxQuantile would return
    // empty bounds, and every row would silently collapse into bucket 0 —
    // the single-task cliff the operator exists to avoid
    val df = Seq(("b", 1L), ("a", 2L)).toDF("name", "id")
    val e = intercept[IllegalArgumentException](
      Ranking.globalRank(df, Seq(col("name"), col("id"))))
    assert(e.getMessage.contains("double-castable"))
    // numeric/timestamp heads stay accepted
    val ranked = Ranking.globalRank(df, Seq(col("id")))
      .orderBy("id").select("global_rank").as[Long].collect().toSeq
    assert(ranked == Seq(1L, 2L))
    val ts = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 00:00:02"))).toDF("name", "t")
    val rankedTs = Ranking.globalRank(ts, Seq(col("t")))
      .orderBy("t").select("global_rank").as[Long].collect().toSeq
    assert(rankedTs == Seq(1L, 2L))
  }
}
