package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata produced by the (stubbed) media decoder. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake (clearly marked) — but every Spark-side concern a real
  * decoder needs is real and tested: binary column representation, typed
  * output schema via case-class Encoder, per-partition batch iteration
  * (`mapPartitions`, the Scala analogue of `mapInPandas` batches), and
  * partition-friendly ordering.
  */
object Multimodal {

  /** STUB: deterministic fake decode standing in for a real image/video
    * codec. Derives pseudo-metadata purely from the bytes so tests are
    * reproducible: format from a leading-byte heuristic, dimensions from
    * simple byte folds. Swap the body for a real codec (javacv, etc.) —
    * signature and call sites stay unchanged.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val head = if (n > 0) bytes(0) & 0xff else 0
    val format = head % 3 match {
      case 0 => "img/fake-png"
      case 1 => "img/fake-jpeg"
      case _ => "vid/fake-mp4"
    }
    var fold = 0L
    var i = 0
    while (i < n) { fold = (fold * 131 + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
    MediaMeta(
      doc_id = docId,
      n_bytes = n.toLong,
      format = format,
      width = (16 + (fold % 240)).toInt,
      height = (16 + ((fold / 240) % 240)).toInt,
      n_frames = if (format.startsWith("vid")) (1 + (fold % 32)).toInt else 1)
  }

  /** Decode a (id, blob) DataFrame into typed metadata, one decoder
    * instance per partition (where a real codec would amortize init cost —
    * the same batching contract as `mapInPandas`).
    */
  def decodeMeta(blobs: DataFrame): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
