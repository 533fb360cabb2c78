package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.Upsert

/** Incremental/streaming mode (SURVEY.md §7 Phase 3).
  *
  * The reference's "near-real-time" behavior is a 6-hour cron re-fetching a
  * 2-day overlap window, relying on PK upsert to absorb the duplicates
  * (reference `airflow/dags/market_data_dag.py:15`,
  * `src/config/settings.py:53-54`, `postgres_writer.py:234-240`). That is
  * exactly Structured Streaming's incremental micro-batch + idempotent-sink
  * pattern:
  *
  *  - file source over a landing directory, `Trigger.AvailableNow` ≙ the
  *    cron tick (process everything new, then stop);
  *  - `withWatermark` + `dropDuplicates` ≙ the overlap-refetch tolerance
  *    (late data within the watermark is deduped on the PK);
  *  - `foreachBatch` → the keyed upsert sink ≙ ON CONFLICT DO UPDATE.
  */
object StreamingIngest {

  /** Landing-directory file source (schema must be supplied — streaming
    * sources cannot infer).
    */
  def readLanding(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** PK dedup within a lateness watermark — the reference's overlap-window
    * re-delivery absorbed in-stream (keys: the upsert PK).
    */
  def dedupedWithinWatermark(
      events: DataFrame,
      tsCol: String,
      lateness: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, lateness).dropDuplicates(keys)

  /** Tumbling-window aggregation (the streaming face of CoreQueries A12):
    * per (hour, event_type) counts and sums, emitted once the watermark
    * passes the window end.
    */
  def hourlyAgg(events: DataFrame, tsCol: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Drain everything currently in the landing dir through the keyed
    * parquet-merge upsert sink, then stop (AvailableNow ≙ one cron tick).
    * Running the same tick twice converges — the sink is idempotent.
    */
  def upsertAvailableNow(
      deduped: DataFrame,
      targetPath: String,
      checkpoint: String,
      keys: Seq[String],
      versionCol: String): StreamingQuery =
    deduped.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Upsert.mergeIntoParquet(batch.sparkSession, targetPath, batch, keys, versionCol)
      }
      .start()
}
