package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history: every change opens a version row with a
  * validity interval `[valid_from, valid_to)` (`valid_to` NULL = current) —
  * the history-PRESERVING sibling of [[Upsert]]'s last-write-wins merge
  * (the reference's ON CONFLICT keeps only the newest row per key,
  * `postgres_writer.py:234-259`; SCD2 is what the warehouse keeps when
  * "what did this dimension say at time T?" must stay answerable).
  * Point-in-time lookup over the result is exactly the engine's as-of
  * join ([[graft.plans.AsOfJoin]]) on `valid_from`.
  *
  * Scale shape (100 TB): [[build]] is ONE keyed window (row_number +
  * lead over the key partition) — no self-join, no global sort;
  * [[fold]] rebuilds ONLY the keys a change batch touches (semi-join)
  * and streams every untouched key through an anti-join unchanged — the
  * incremental-MV discipline of e12/t19 applied to dimension history.
  */
object Scd2 {

  /** Full history from a change stream. `changes` must be unique per
    * (key, ts) — pre-aggregate upstream (the e14 query takes max(value),
    * the same tie policy as a13's purchase pre-agg). Output columns:
    * key, `version` (1-based per key in ts order), `valid_from`,
    * `valid_to` (NULL = open), payload…, `is_current`.
    */
  def build(changes: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    requireNoReserved(keyCol, tsCol, valueCols)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
      .select((Seq(keyCol, "version", "valid_from", "valid_to") ++
        valueCols :+ "is_current").map(col): _*)
  }

  /** Incrementally fold a change batch into an existing history.
    * Versions of keys the batch touches are flattened back to changes,
    * merged with the batch (on a (key, ts) collision the BATCH row wins —
    * new data corrects history), and rebuilt; untouched keys pass through
    * untouched. Law (Scd2Spec): folding batches in any grouping equals
    * one [[build]] over the union of all changes.
    */
  def fold(history: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    requireNoReserved(keyCol, tsCol, valueCols)
    // the touched-key set is batch-bounded — broadcast it so BOTH the
    // pass-through (anti) and selection (semi) lanes stream the history
    // map-only instead of hash-exchanging the corpus on the key.
    // NULL-SAFE equality (<=>): build's window groups null keys into one
    // chain, so the fold's lanes must select them the same way — plain
    // equality would pass old null-key versions through AND rebuild the
    // batch's null-key rows as a second chain, breaking the fold law.
    val touchedKeys = broadcast(
      batch.select(col(keyCol).as("__touched_key")).distinct())
    val untouched = history
      .join(touchedKeys, col(keyCol) <=> col("__touched_key"), "left_anti")
    val touchedChanges = history
      .join(touchedKeys, col(keyCol) <=> col("__touched_key"), "left_semi")
      .select((Seq(col(keyCol), col("valid_from").as(tsCol)) ++
        valueCols.map(col)): _*)
    val vs = struct(valueCols.map(col): _*)
    val merged = touchedChanges.withColumn("__src", lit(0))
      .unionByName(batch.withColumn("__src", lit(1)))
      .groupBy(col(keyCol), col(tsCol))
      .agg(max_by(vs, col("__src")).as("__vs"))
      .select(col(keyCol), col(tsCol), col("__vs.*"))
    untouched.unionByName(build(merged, keyCol, tsCol, valueCols))
  }

  /** `withColumn` silently REPLACES an existing column, so a payload
    * column named like a generated one would be overwritten with the
    * window ordinal and the user's data lost — fail fast instead.
    */
  private def requireNoReserved(
      keyCol: String, tsCol: String, valueCols: Seq[String]): Unit = {
    val reserved = Set("version", "valid_from", "valid_to", "is_current")
    // the ts column is renamed TO valid_from, so that one name is fine for
    // it — but "version"/"valid_to"/"is_current" would be clobbered by
    // withColumn before the window/rename ever read the timestamps
    val clash = (valueCols :+ keyCol).filter(reserved.contains) ++
      Seq(tsCol).filter(reserved - "valid_from")
    require(clash.isEmpty,
      s"Scd2: column name(s) ${clash.distinct.mkString(", ")} collide with generated " +
        "history columns (version, valid_from, valid_to, is_current) — rename upstream")
  }
}
