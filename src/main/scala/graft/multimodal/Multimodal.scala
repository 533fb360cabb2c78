package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata produced by the container-header decoder. */
final case class MediaHeader(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    width: Long,
    height: Long,
    channels: Long)

/** Typed metadata produced by the audio-container decoder (RIFF/WAVE). */
final case class AudioHeader(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    channels: Long,
    sample_rate: Long,
    bits_per_sample: Long)

/** Typed metadata produced by the video-container decoder (ISO BMFF / MP4). */
final case class VideoHeader(
    doc_id: Long,
    n_bytes: Long,
    format: String,
    version: Long,
    timescale: Long,
    duration: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded per partition.
  *
  * The container ships no pixel codecs, but a pipeline's metadata pass never
  * needs one: format, dimensions and channel count live in the first ≤ 40
  * bytes of every mainstream container. [[parseHeader]] is therefore a REAL
  * decoder for the header layer — PNG signature + IHDR big-endian fields
  * (PNG spec §5.2/§11.2.2), JPEG marker scan to a start-of-frame segment
  * (ISO/IEC 10918-1 §B.2.2 — segments are skipped by their declared lengths,
  * so arbitrary APPn/COM segments between SOI and SOFn are handled), the
  * GIF89a little-endian logical screen descriptor (GIF89a spec §18), and
  * the TIFF 6.0 IFD walk in the file's self-declared byte order ("II"/"MM",
  * TIFF 6.0 §2 — the one container whose endianness flips at runtime). Only
  * pixel decode (the part that genuinely needs a codec library) is out of
  * scope; swapping in javacv et al. would extend, not replace, this path.
  *
  * Spark-side concerns a real decoder needs are all here and tested: binary
  * column representation, typed output schema via case-class Encoder,
  * per-partition batch iteration (`mapPartitions`, the Scala analogue of
  * `mapInPandas` batches), and partition-friendly ordering.
  */
object Multimodal {

  /** Parse the container header of `bytes`: magic sniff, then the
    * format-specific dimension fields. Unknown or truncated containers
    * degrade to `("unknown", 0, 0, 0)` — a metadata pass must never throw
    * on a corrupt blob (it COUNTS them; see m9).
    */
  def parseHeader(docId: Long, bytes: Array[Byte]): MediaHeader = {
    val n = bytes.length
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Long = ((u(i) << 8) | u(i + 1)).toLong
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1).toLong << 16) | (u(i + 2).toLong << 8) | u(i + 3).toLong
    def le16(i: Int): Long = (u(i) | (u(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
    val unknown = MediaHeader(docId, n.toLong, "unknown", 0L, 0L, 0L)

    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val isPng = n >= 33 && pngSig.indices.forall(i => u(i) == pngSig(i)) &&
      u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
    val isGif = n >= 13 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
      u(3) == '8' && (u(4) == '7' || u(4) == '9') && u(5) == 'a'
    val isJpeg = n >= 4 && u(0) == 0xff && u(1) == 0xd8
    // TIFF 6.0 §2: "II" (little-endian) or "MM" (big-endian) byte-order
    // mark, then 42 IN THAT BYTE ORDER — the one mainstream container whose
    // endianness is decided at runtime per file, not by the spec.
    val isTiff = n >= 8 &&
      ((u(0) == 'I' && u(1) == 'I' && u(2) == 0x2a && u(3) == 0x00) ||
        (u(0) == 'M' && u(1) == 'M' && u(2) == 0x00 && u(3) == 0x2a))

    if (isPng) {
      // IHDR is mandated first: width/height BE32 at 16/20, colour type at 25
      val channels = u(25) match {
        case 0 => 1L // greyscale
        case 2 => 3L // truecolour
        case 3 => 1L // indexed
        case 4 => 2L // grey + alpha
        case 6 => 4L // truecolour + alpha
        case _ => 0L
      }
      MediaHeader(docId, n.toLong, "png", be32(16), be32(20), channels)
    } else if (isGif) {
      // logical screen descriptor: width/height LE16 at 6/8; pixels resolve
      // through the colour table, i.e. RGB
      MediaHeader(docId, n.toLong, "gif", le16(6), le16(8), 3L)
    } else if (isJpeg) {
      // marker scan: every segment after SOI declares its own length, so we
      // hop segment-to-segment until a start-of-frame (SOF0–SOF3) carries
      // precision/height/width/components — the layout every baseline and
      // progressive JPEG shares regardless of how many APPn/COM segments
      // precede it
      var i = 2
      var out: MediaHeader = null
      var live = true
      while (live && out == null && i + 4 <= n && u(i) == 0xff) {
        val marker = u(i + 1)
        if (marker >= 0xc0 && marker <= 0xc3) {
          if (i + 10 <= n)
            out = MediaHeader(docId, n.toLong, "jpeg", be16(i + 7), be16(i + 5), u(i + 9).toLong)
          else live = false
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i += 2 // standalone markers carry no length field
        } else {
          i += 2 + be16(i + 2).toInt
        }
      }
      if (out != null) out else unknown
    } else if (isTiff) {
      // IFD walk (TIFF 6.0 §2): u32 IFD offset at 4, then `count(u16)` +
      // count × 12-byte entries of `tag(u16) type(u16) count(u32)
      // value(u32)`. SHORT (type 3) values sit left-justified inside the
      // value field in the FILE's byte order; LONG (type 4) fills it. The
      // walker reads every entry and keeps ImageWidth(256) /
      // ImageLength(257) / SamplesPerPixel(277), skipping whatever else the
      // writer interleaved (sorted-tag order means unrelated tags like Make
      // land BETWEEN the wanted ones — positional slicing is not an option
      // here, which is exactly what the oracle's independent fixed-layout
      // slice verifies against).
      val le = u(0) == 'I'
      def t16(i: Int): Long = if (le) le16(i) else be16(i)
      def t32(i: Int): Long = if (le) le32(i) else be32(i)
      val ifd = t32(4)
      if (ifd < 8 || ifd + 2 > n) unknown
      else {
        val base = ifd.toInt
        val cnt = t16(base).toInt
        if (base + 2 + 12 * cnt > n) unknown
        else {
          var w = 0L
          var h = 0L
          var spp = 1L // SamplesPerPixel defaults to 1 (TIFF 6.0, tag 277)
          var e = 0
          while (e < cnt) {
            val o = base + 2 + 12 * e
            // The value field holds the value INLINE only when it fits in 4
            // bytes; otherwise it holds a file offset (TIFF 6.0 §2, "Value
            // Offset"). For the tags this walker wants, the spec fixes
            // count = 1 — so accept the inline read ONLY when the entry's
            // count field says 1. A SHORT/LONG entry with count > 1 stores
            // an offset (or two packed shorts), and reading it as the value
            // would fabricate a bogus width/height/spp on real-world TIFFs;
            // such entries degrade to unparsed, same as unknown types.
            val v: Long = if (t32(o + 4) != 1L) -1L
            else t16(o + 2) match {
              case 3 => t16(o + 8)
              case 4 => t32(o + 8)
              case _ => -1L
            }
            if (v >= 0) t16(o) match {
              case 256 => w = v
              case 257 => h = v
              case 277 => spp = v
              case _ => ()
            }
            e += 1
          }
          MediaHeader(docId, n.toLong, if (le) "tiff_le" else "tiff_be", w, h, spp)
        }
      }
    } else unknown
  }

  /** Parse a RIFF/WAVE audio container header: after the 12-byte
    * `RIFF <size> WAVE` preamble, WALK the chunk chain — each chunk is
    * `id(4) + size(LE32) + body(size, padded to even)` and the spec does
    * NOT fix the `fmt ` chunk's position (LIST/INFO, `bext`, `JUNK`
    * chunks routinely precede it in the wild) — until the `fmt ` chunk
    * yields channels (LE16 @ body+2), sample rate (LE32 @ body+4) and
    * bits-per-sample (LE16 @ body+14). Truncated, non-RIFF, or
    * fmt-less blobs degrade to `("unknown", 0, 0, 0)` — the same
    * never-throw contract as [[parseHeader]].
    */
  def parseWavHeader(docId: Long, bytes: Array[Byte]): AudioHeader = {
    val n = bytes.length
    def u(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Long = (u(i) | (u(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean = s.indices.forall(k => u(i + k) == s.charAt(k))
    val unknown = AudioHeader(docId, n.toLong, "unknown", 0L, 0L, 0L)
    if (n < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) unknown
    else {
      var i = 12
      var out: AudioHeader = null
      while (out == null && i + 8 <= n) {
        val size = le32(i + 4)
        if (tag(i, "fmt ") && size >= 16 && i + 8 + 16 <= n)
          out = AudioHeader(docId, n.toLong, "wav",
            le16(i + 10), le32(i + 12), le16(i + 22))
        else if (size > n.toLong) i = n // corrupt size field: stop the walk
        else i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
      if (out != null) out else unknown
    }
  }

  /** Parse an ISO BMFF (MP4) container header: a WALK over the top-level
    * box chain — each box is `size(BE32) + type(4)`, where size == 1 means
    * a 64-bit extended size follows the type and size == 0 means the box
    * runs to EOF (ISO/IEC 14496-12 §4.2) — to the `moov` box, then a
    * nested walk over moov's children to `mvhd`, whose VERSION byte picks
    * the field widths (§8.2.2: v0 = 32-bit times, v1 = 64-bit): timescale
    * is BE32 in both, duration BE32 (v0) or BE64 (v1), each after
    * version-dependent creation/modification times. Three decode
    * capabilities the image/audio lanes never exercised together: nesting,
    * extended sizes, and version-switched layouts. Truncated, non-BMFF, or
    * mvhd-less blobs degrade to `("unknown", 0, 0, 0)` — the same
    * never-throw contract as [[parseHeader]].
    */
  def parseMp4Header(docId: Long, bytes: Array[Byte]): VideoHeader = {
    val n = bytes.length
    def u(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1).toLong << 16) | (u(i + 2).toLong << 8) | u(i + 3).toLong
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int, s: String): Boolean = s.indices.forall(k => u(i + k) == s.charAt(k))
    val unknown = VideoHeader(docId, n.toLong, "unknown", 0L, 0L, 0L)
    // ISO BMFF has no magic — the convention (and every real mp4) is an
    // ftyp box first; require it so arbitrary bytes don't sniff as video.
    if (n < 16 || !tag(4, "ftyp")) unknown
    else {
      // (start of box body, one-past-end) for the box chain in [from, to)
      // whose type matches, walking sizes incl. the ==1/==0 special cases
      def findBox(from: Int, to: Int, typ: String): Option[(Int, Int)] = {
        var i = from
        while (i + 8 <= to) {
          val size = be32(i)
          val (body, end) =
            if (size == 1) {
              if (i + 16 > to) return None
              val ext = be64(i + 8)
              if (ext < 16 || ext > (to - i).toLong) return None
              (i + 16, i + ext.toInt)
            } else if (size == 0) (i + 8, to) // runs to EOF
            else {
              if (size < 8 || size > (to - i).toLong) return None
              (i + 8, i + size.toInt)
            }
          if (tag(i + 4, typ)) return Some((body, end))
          if (end <= i) return None // corrupt size: no forward progress
          i = end
        }
        None
      }
      (for {
        (moovBody, moovEnd) <- findBox(0, n, "moov")
        (mvhd, mvhdEnd) <- findBox(moovBody, moovEnd, "mvhd")
      } yield {
        val v = if (mvhd < mvhdEnd) u(mvhd) else -1
        // body: version(1) flags(3), then ctime/mtime (4+4 or 8+8),
        // timescale BE32, duration BE32 (v0) / BE64 (v1)
        if (v == 0 && mvhd + 20 <= mvhdEnd)
          VideoHeader(docId, n.toLong, "mp4", 0L, be32(mvhd + 12), be32(mvhd + 16))
        else if (v == 1 && mvhd + 32 <= mvhdEnd)
          VideoHeader(docId, n.toLong, "mp4", 1L, be32(mvhd + 20), be64(mvhd + 24))
        else unknown
      }).getOrElse(unknown)
    }
  }

  /** Decode a (doc_id, blob) DataFrame of MP4 containers into typed video
    * metadata — same per-partition batching contract as [[decodeMeta]].
    */
  def decodeVideoMeta(blobs: DataFrame): Dataset[VideoHeader] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseMp4Header(id, bytes) })
  }

  /** Decode a (doc_id, blob) DataFrame of WAVE containers into typed audio
    * metadata — same per-partition batching contract as [[decodeMeta]].
    */
  def decodeAudioMeta(blobs: DataFrame): Dataset[AudioHeader] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseWavHeader(id, bytes) })
  }

  /** Decode a (doc_id, blob) DataFrame into typed header metadata, one
    * decoder scope per partition (where a real pixel codec would amortize
    * its init cost — the same batching contract as `mapInPandas`).
    */
  def decodeMeta(blobs: DataFrame): Dataset[MediaHeader] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here
        it.map { case (id, bytes) => parseHeader(id, bytes) }
      }
  }
}
