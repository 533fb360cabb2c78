package graft.etl

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's pipeline driver re-expressed as ONE lazy Spark plan
  * (reference `src/main.py:9-141`: fetch → standardize → convert → upsert).
  *
  * Where the reference materializes a whole DataFrame between stages in a
  * single process, here the stages compose into one logical plan: Catalyst
  * sees standardize+convert+dedup together (column pruning and predicate
  * placement cross stage boundaries), and execution happens once, at the
  * sink. The observation hooks replace the reference's per-stage log lines
  * (`standardizer.py:253-258` null audit, `currency_converter.py:170-174`
  * missing-rate count) without extra jobs — metrics ride on the write pass.
  */
object Pipeline {

  /** Audit metrics collected during the single execution pass. */
  final case class RunMetrics(rows: Long, nullClose: Long, missingRate: Long)

  /** E1→E2→E3 over long-format bars: returns the metrics observed while the
    * converted, deduped batch was merged into `targetPath`.
    *
    * Idempotent: re-running with the same bars converges (the merge sink's
    * keyed DO-UPDATE, ≙ reference `postgres_writer.py:234-240` +
    * `README.md:37`).
    */
  def run(
      spark: SparkSession,
      bars: DataFrame,
      dim: DataFrame,
      rates: RateProvider,
      targetPath: String,
      targetCurrency: String = "USD",
      sourceTz: Option[String] = None): RunMetrics = {
    val standardized = Standardizer.standardize(bars, dim, sourceTz)
    val converted =
      CurrencyConverter.convertWithProvider(spark, standardized, rates, targetCurrency)
    val obs = Observation("pipeline_audit")
    val observed = converted.observe(
      obs,
      count(lit(1)).as("rows"),
      sum(col("close").isNull.cast("long")).as("null_close"),
      sum((col("close").isNotNull &&
        col(s"close_${targetCurrency.toLowerCase}").isNull).cast("long"))
        .as("missing_rate"))
    val deduped = Upsert.lastWriteWins(
      observed, keys = Seq("ticker", "timestamp_utc"), versionCol = "timestamp_utc")
    Upsert.mergeIntoParquet(spark, targetPath, deduped,
      keys = Seq("ticker", "timestamp_utc"), versionCol = "timestamp_utc")
    val m = obs.get
    RunMetrics(
      rows = m("rows").asInstanceOf[Long],
      nullClose = m("null_close").asInstanceOf[Long],
      missingRate = m("missing_rate").asInstanceOf[Long])
  }
}
