package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.DedupQueries
import graft.multimodal.MultimodalQueries
import graft.queries.CoreQueries
import graft.similarity.SimilarityQueries
import graft.text.TextQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way star join + aggregate (A5) exercises scan → broadcast +
    * shuffle joins → partial agg → sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.a5StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ MultimodalQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ MultimodalQueries.oracles
}
