package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.IndexMeta

/** S2 — the dimension/config source: load index metadata from a JSON config
  * file shaped like the reference's `src/config/indices.json:1-82` (an array
  * of {name, ticker, country, exchange, currency} objects) with the same
  * required-key validation as `src/config/settings.py:14-39` — but failing
  * loudly instead of silently dropping entries.
  */
object ConfigSource {

  private val required = Seq("name", "ticker", "country", "exchange", "currency")

  /** Parse + validate. Throws IllegalArgumentException naming the missing
    * field and the offending entries (≙ `settings.py:20-24`'s required-key
    * check).
    */
  def loadIndexMeta(spark: SparkSession, path: String): Dataset[IndexMeta] = {
    import spark.implicits._
    val raw = spark.read.option("multiLine", "true").json(path)
    val missingCols = required.filterNot(raw.columns.contains)
    require(missingCols.isEmpty,
      s"config $path missing required field(s): ${missingCols.mkString(", ")}")
    val withNulls = raw.filter(required.map(col(_).isNull).reduce(_ || _))
    val bad = withNulls.select(coalesce(col("ticker"), col("name")).as("id"))
      .limit(5).collect().map(_.getString(0))
    require(bad.isEmpty,
      s"config $path has entries with null required fields: ${bad.mkString(", ")}")
    raw.select(required.map(col): _*).as[IndexMeta]
  }
}
