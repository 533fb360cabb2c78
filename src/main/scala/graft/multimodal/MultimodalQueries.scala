package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal query surface over `documents`, treating text bytes as the
  * opaque media blob (the container ships no codecs — see
  * [[Multimodal.decodeStub]]). M1/M2 are pure-SQL blob plumbing with DuckDB
  * oracles; M3 exercises the typed mapPartitions decode path (rows-only
  * check: the stub isn't SQL-expressible).
  */
object MultimodalQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** M1 — binary-column metadata: byte length, content digest, leading-bytes
    * signature (what a real pipeline uses for container-format sniffing).
    */
  def m1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        sha2(col("blob"), 256).as("blob_sha256"),
        lower(hex(substring(col("blob"), 1, 8))).as("magic_hex"))
      .orderBy("doc_id")

  /** M2 — frame sampling plumbing: generate a strided frame index per blob
    * (every 50 "bytes" ≙ every Nth frame), extract a fixed-width slice per
    * frame, fingerprint it. The explode fan-out + per-frame projection is
    * exactly the shape of real video frame extraction at scale.
    */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0, CAST(n_chars - 1 AS INT), 50)")).as("frame_off"))
      .select(
        col("doc_id"), col("frame_off").cast("long").as("frame_off"),
        md5(substring(col("text"), col("frame_off").cast("int") + 1, lit(16))).as("frame_md5"))
      .orderBy("doc_id", "frame_off")

  /** M4 — per-source media storage telemetry: blob counts, byte volume,
    * distinct-content counts and the implied dedup savings — the dashboard
    * a multimodal corpus is curated from. One hash aggregate over
    * (source, digest), then one over source.
    */
  def m4StorageStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("blob", col("text").cast("binary"))
      .groupBy(col("source"), sha2(col("blob"), 256).as("digest"))
      .agg(count(lit(1)).as("copies"), max(length(col("blob")).cast("long")).as("blob_bytes"))
      .groupBy(col("source"))
      .agg(
        sum(col("copies")).as("n_blobs"),
        count(lit(1)).as("n_distinct_blobs"),
        sum(col("copies") * col("blob_bytes")).as("total_bytes"),
        sum(col("blob_bytes")).as("deduped_bytes"))
      .withColumn("savings_ratio",
        lit(1.0) - col("deduped_bytes").cast("double") / col("total_bytes"))
      .orderBy("source")

  /** M3 — typed decode via mapPartitions (stubbed codec, real plumbing). */
  def m3DecodeStub(s: SparkSession, dir: String): DataFrame = {
    val blobs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    Multimodal.decodeMeta(blobs).toDF().orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> (m1BinaryMeta _),
    "m2_frame_sample" -> (m2FrameSample _),
    "m3_decode_stub" -> (m3DecodeStub _),
    "m4_storage_stats" -> (m4StorageStats _))

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS blob_sha256,
           lower(substr(hex(encode(text)), 1, 16)) AS magic_hex
         FROM documents ORDER BY doc_id""",
    "m2_frame_sample" ->
      """SELECT doc_id, frame_off, md5(substr(text, frame_off + 1, 16)) AS frame_md5
         FROM (SELECT doc_id, text, unnest(range(0, n_chars, 50)) AS frame_off
               FROM documents WHERE n_chars > 0)
         ORDER BY doc_id, frame_off""",
    "m4_storage_stats" ->
      """WITH per_digest AS (
           SELECT source, sha256(text) AS digest, COUNT(*) AS copies,
                  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS blob_bytes
           FROM documents GROUP BY source, sha256(text))
         SELECT source,
                CAST(SUM(copies) AS BIGINT) AS n_blobs,
                COUNT(*) AS n_distinct_blobs,
                CAST(SUM(copies * blob_bytes) AS BIGINT) AS total_bytes,
                CAST(SUM(blob_bytes) AS BIGINT) AS deduped_bytes,
                1.0 - CAST(SUM(blob_bytes) AS DOUBLE) / SUM(copies * blob_bytes)
                  AS savings_ratio
         FROM per_digest GROUP BY source ORDER BY source""")
    // m3_decode_stub: rows-only (stub decoder not SQL-expressible)
}
