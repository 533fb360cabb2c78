package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal query surface over `documents`, treating text bytes as the
  * opaque media blob. M1/M2 are pure-SQL blob plumbing with DuckDB oracles;
  * M3 frames each blob in a real container header (PNG/JPEG/GIF, built
  * byte-exactly in SQL) and runs the typed mapPartitions header decoder
  * ([[Multimodal.parseHeader]]) over it, oracle-verified by independent
  * byte slicing in DuckDB.
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

  /** M5 — perceptual-hash near-dup pairs (the aHash family: average-hash
    * over frame intensities, PDQ/pHash's cheap ancestor): per blob, a 32-bit
    * fingerprint (bit i = frame i's intensity above the blob's mean), then
    * near-dup pairs via banded blocking + Hamming verify. This is how image
    * near-dup dedup actually runs at corpus scale — a pixel-exact digest
    * (M1/M4) misses re-encodes, while perceptual bits survive them.
    *
    * The blob is first "resized" to exactly 32 segments (aHash resizes to
    * 8x8 pixels for the same reason): uniform bit budget per blob, so short
    * blobs don't collide on shared zero high bits. A 32-bit hash is a
    * recall-oriented CANDIDATE generator — real pipelines chain a stronger
    * verify behind it; hamming-0 here means "same coarse intensity
    * profile", not byte equality.
    *
    * Exactness: frame intensity = integer byte sum; "above mean" compares
    * `luma*32 > total` so no division ever happens — bit-identical across
    * engines. Scale shape: fingerprints are one narrow pass (segment explode
    * + doc-keyed sum); pairing is the X2/X3 recipe — 4 8-bit band buckets
    * bound the join (band-equality candidates only), the Hamming cut runs on
    * candidates, never all pairs.
    */
  def m5PerceptualNearDup(s: SparkSession, dir: String, maxHamming: Int = 4): DataFrame = {
    // "resize" each blob to exactly 32 segments (stride = n_chars div 32;
    // the sub-stride remainder is dropped) so every fingerprint carries 32
    // meaningful bits — without the resize, short blobs would share runs of
    // zero high bits and collide spuriously
    val frames = t(s, dir, "documents")
      .filter(col("n_chars") >= 32)
      .select(col("doc_id"), col("text"), (col("n_chars") / 32).cast("int").as("stride"),
        explode(expr("sequence(0, 31)")).as("idx"))
      .select(col("doc_id"), col("idx"),
        expr("""aggregate(split(substring(text, idx * stride + 1, stride), ''),
                CAST(0 AS BIGINT), (a, c) -> a + ascii(c))""").as("luma"))
    val hashes = frames
      .groupBy(col("doc_id"))
      .agg(sum(col("luma")).as("total"),
        collect_list(struct(col("idx"), col("luma"))).as("fl"))
      .select(col("doc_id"),
        expr("""aggregate(fl, CAST(0 AS BIGINT),
                (acc, f) -> acc + IF(f.luma * 32 > total,
                                     shiftleft(CAST(1 AS BIGINT), f.idx), CAST(0 AS BIGINT)))""")
          .as("phash"))
    val banded = hashes.select(col("doc_id"), col("phash"),
      explode(expr(
        """transform(sequence(0, 3),
             b -> named_struct('band', b, 'bv', shiftright(phash, b * 8) & 255))""")).as("bb"))
      .select(col("doc_id"), col("phash"), col("bb.band"), col("bb.bv"))
    // Verify BEFORE deduplicating (X20's shape): the hamming check is
    // row-local integer codegen on the raw band-join output (a pair
    // appears once per shared band, ≤ 4×), so the distinct shuffles only
    // the ≤-maxHamming survivors — result-scale, 3 columns — instead of
    // every banded candidate with both fingerprints.
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        expr("bit_count(l.phash ^ r.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** M6 — chunk-level dedup telemetry: blobs sliced into fixed 64-byte
    * chunks, per-source distinct-chunk ratios — the fixed-size-chunking
    * storage-dedup estimate (the cheap cousin of content-defined chunking)
    * that catches partial blob overlap M4's whole-blob digests can't see
    * (re-muxed containers, appended metadata, shared preambles). Scale
    * shape: chunking is a narrow explode (fan-out = bytes/64, linear in
    * corpus bytes), then two stacked keyed aggregates — (source, chunk)
    * partials absorb repeats map-side, never anything pairwise.
    */
  def m6ChunkDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .select(col("source"), explode(expr(
        "transform(sequence(0, CAST((n_chars - 1) div 64 AS INT)), i -> md5(substring(text, i * 64 + 1, 64)))"))
        .as("chunk_md5"))
      .groupBy(col("source"), col("chunk_md5"))
      .agg(count(lit(1)).as("copies"))
      .groupBy(col("source"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"))
      .withColumn("chunk_dedup_ratio",
        lit(1.0) - col("n_distinct_chunks").cast("double") / col("n_chunks").cast("double"))
      .orderBy("source")

  /** Ordered content-defined chunking of `documents` rows: beside each doc,
    * the array of CDC chunks whose concatenation is exactly `text`. A cut
    * lands after position i whenever the polynomial hash of the 8-gram
    * ending at i is ≡ 0 (mod 64) — boundary decisions depend only on local
    * content, never on absolute offsets, so an insertion re-synchronizes at
    * the next content cut and every later chunk digest survives (the LBFS
    * property; Muthitacharoen et al., SOSP'01). Exposed so the spec can
    * prove reconstruction and insertion-robustness on the ordered array.
    */
  private[graft] def cdcChunked(docs: DataFrame): DataFrame = {
    // Two linearity traps, both hit and fixed here:
    // (1) `substring(text, i, 1)` scans from the string head every call
    //     (UTF8String is variable-width) — hashing every 8-gram that way is
    //     O(n²)/doc, measured 428 s over sf0.1's 1.5M chars. Decompose to a
    //     char-code array once and every window term is an O(1) element_at.
    // (2) The decomposed array must be bound as a LAMBDA VARIABLE, not a
    //     projected column: CollapseProject inlines a `withColumn` alias
    //     into the downstream lambda bodies, re-evaluating the O(n)
    //     split/transform INSIDE the per-element cut predicate — O(n²)
    //     again (wedged a verify run for 15+ min on one task).
    //     `transform(array(x), v -> body)[0]` evaluates x exactly once per
    //     row; the optimizer cannot collapse through a higher-order
    //     function's variable binding. Chunk bytes come from
    //     slice+array_join off the same bound array (O(chunk), not
    //     O(offset)), keeping the whole operator linear in corpus chars.
    def a(off: Int): String = s"element_at(cs, CAST(i - $off AS INT))"
    val cuts =
      s"""CASE WHEN n_chars >= 8 THEN
           filter(sequence(CAST(8 AS BIGINT), n_chars), i ->
             (${a(7)} * 27512614111 +
              ${a(6)} * 887503681 +
              ${a(5)} * 28629151 +
              ${a(4)} * 923521 +
              ${a(3)} * 29791 +
              ${a(2)} * 961 +
              ${a(1)} * 31 +
              ${a(0)}) % 64 = 0)
         ELSE CAST(array() AS ARRAY<BIGINT>) END"""
    val chunks =
      s"""transform(array(split(text, '')), chs ->
            transform(array(transform(chs, c -> CAST(ascii(c) AS BIGINT))), cs ->
              transform(array(concat(array(CAST(0 AS BIGINT)), $cuts, array(n_chars))), bs ->
                filter(
                  transform(sequence(1, size(bs) - 1), j ->
                    array_join(slice(chs, CAST(element_at(bs, j) + 1 AS INT),
                      CAST(element_at(bs, j + 1) - element_at(bs, j) AS INT)), '')),
                  c -> length(c) > 0))[0])[0])[0]"""
    docs
      .filter(col("n_chars") > 0)
      .withColumn("chunks", expr(chunks))
  }

  /** M7 — content-defined chunk dedup (the CDC upgrade of M6): cut points
    * chosen by a rolling-content hash instead of fixed 64-byte strides, so
    * a one-byte insertion shifts ONE chunk, not every chunk after it —
    * fixed-size chunking's failure mode on re-encoded/prepended blobs.
    * Scale shape is identical to M6: chunking is a narrow per-row
    * projection (the boundary array is a codegen'd higher-order expression,
    * no shuffle, no window), then two stacked keyed aggregates with
    * map-side partials. Avg chunk = 64 chars by the mod-64 cut rate;
    * production adds min/max clamps via the same sorted fold C5 uses.
    */
  def m7CdcChunkDedup(s: SparkSession, dir: String): DataFrame =
    cdcChunked(t(s, dir, "documents"))
      .select(col("source"), explode(col("chunks")).as("chunk"))
      .select(col("source"), md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).as("clen"))
      .groupBy(col("source"), col("chunk_md5"))
      .agg(max(col("clen")).as("clen"), count(lit(1)).as("copies"))
      .groupBy(col("source"))
      .agg(sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("copies") * col("clen")).as("total_chars"),
        sum(col("clen")).as("deduped_chars"))
      .withColumn("chunk_dedup_ratio",
        lit(1.0) - col("n_distinct_chunks").cast("double") / col("n_chunks").cast("double"))
      .orderBy("source")

  /** Spec-correct container-header hex for each document, deterministic
    * from (doc_id, n_chars) so both engines can rebuild it byte-exactly:
    * doc_id%3 picks PNG / JPEG(JFIF) / GIF89a; width = 16 + doc_id%1280 and
    * height = 16 + n_chars%1024 exercise genuine multi-byte fields (BE for
    * PNG/JPEG, LE for GIF); channel variants rotate on doc_id div 3. The
    * JPEG header is a real segment chain — SOI, a 16-byte APP0/JFIF, then
    * SOF0 with per-component specs — so a decoder must WALK it, not assume
    * an offset. The PNG IHDR CRC is a zeroed placeholder (the decoder
    * parses fields; it does not checksum). Mirrored verbatim in the m3
    * oracle.
    */
  private[graft] val mediaHeaderHex: String =
    """CASE CAST(doc_id % 3 AS INT)
       WHEN 0 THEN concat(
         '89504E470D0A1A0A', '0000000D', '49484452',
         lpad(hex(16 + doc_id % 1280), 8, '0'),
         lpad(hex(16 + n_chars % 1024), 8, '0'),
         '08', lpad(hex(element_at(array(0, 2, 6), CAST((doc_id div 3) % 3 AS INT) + 1)), 2, '0'),
         '000000', '00000000')
       WHEN 1 THEN concat(
         'FFD8', 'FFE000104A46494600010100000100010000',
         'FFC0', lpad(hex(8 + 3 * IF((doc_id div 3) % 2 = 0, 3, 1)), 4, '0'),
         '08',
         lpad(hex(16 + n_chars % 1024), 4, '0'),
         lpad(hex(16 + doc_id % 1280), 4, '0'),
         lpad(hex(IF((doc_id div 3) % 2 = 0, 3, 1)), 2, '0'),
         IF((doc_id div 3) % 2 = 0, '011100021101031101', '011100'))
       ELSE concat(
         '474946383961',
         lpad(hex((16 + doc_id % 1280) % 256), 2, '0'),
         lpad(hex((16 + doc_id % 1280) div 256), 2, '0'),
         lpad(hex((16 + n_chars % 1024) % 256), 2, '0'),
         lpad(hex((16 + n_chars % 1024) div 256), 2, '0'),
         '000000')
       END"""

  /** M3 — container-header decode via typed mapPartitions: each text blob
    * is framed in a real PNG/JPEG/GIF header ([[mediaHeaderHex]] — the
    * framing a media lake's ingest already has on disk), then
    * [[Multimodal.parseHeader]] sniffs the magic and parses the dimension
    * fields exactly as the container specs lay them out. The oracle
    * rebuilds the same blobs and slices the same header bytes in SQL, so
    * the decoder is verified end-to-end (rows+schema+hash), not rows-only.
    * Scale shape: header build is a narrow codegen projection; decode reads
    * ≤ 40 bytes per blob and is embarrassingly parallel per partition.
    */
  def m3DecodeMeta(s: SparkSession, dir: String): DataFrame = {
    val blobs = t(s, dir, "documents")
      .select(col("doc_id"),
        expr(s"concat(unhex($mediaHeaderHex), CAST(text AS BINARY))").as("blob"))
    Multimodal.decodeMeta(blobs).toDF().orderBy("doc_id")
  }

  /** Little-endian integer → hex SQL fragment, `nBytes` wide. One builder
    * serves both engines: Spark spells integral division `div`, DuckDB
    * `//` — everything else (`hex`, `lpad`, `%`, `concat`) is shared.
    */
  private def leHex(e: String, nBytes: Int, idiv: String): String =
    (0 until nBytes).map { i =>
      val shifted = if (i == 0) s"($e)" else s"(($e) $idiv ${1L << (8 * i)})"
      s"lpad(hex(($shifted) % 256), 2, '0')"
    }.mkString("concat(", ", ", ")")

  /** Big-endian twin of [[leHex]]: most-significant byte first. */
  private def beHex(e: String, nBytes: Int, idiv: String): String =
    (nBytes - 1 to 0 by -1).map { i =>
      val shifted = if (i == 0) s"($e)" else s"(($e) $idiv ${1L << (8 * i)})"
      s"lpad(hex(($shifted) % 256), 2, '0')"
    }.mkString("concat(", ", ", ")")

  /** Spec-correct RIFF/WAVE header hex over columns (ch, sr, bits,
    * has_list, dlen): `RIFF <size> WAVE`, an optional 20-byte LIST/INFO
    * chunk BEFORE `fmt ` (so a decoder must walk the chunk chain, not
    * assume fmt at offset 12), the 16-byte PCM fmt body (channels LE16,
    * sample rate LE32, byte rate LE32, block align LE16, bits LE16), then
    * the `data` chunk header sized to the text payload. Same recipe in
    * both engines via [[leHex]]'s `idiv` seam.
    */
  private[graft] def wavHeaderHex(idiv: String): String = {
    def le16(e: String) = leHex(e, 2, idiv)
    def le32(e: String) = leHex(e, 4, idiv)
    s"""concat(
       '52494646',
       ${le32(s"4 + IF(has_list, 20, 0) + 24 + 8 + dlen")},
       '57415645',
       IF(has_list, concat('4C495354', '0C000000', '494E464F', '4752414654454E47'), ''),
       '666D7420', '10000000', '0100',
       ${le16("ch")}, ${le32("sr")},
       ${le32(s"(sr * ch * bits) $idiv 8")}, ${le16(s"(ch * bits) $idiv 8")},
       ${le16("bits")},
       '64617461', ${le32("dlen")})"""
  }

  /** Spec-correct TIFF 6.0 header hex over columns (is_le, w, h, spp):
    * byte-order mark + magic 42 + IFD-offset-8 preamble, then one IFD of
    * four sorted-tag entries — ImageWidth(0x0100, SHORT), ImageLength
    * (0x0101, SHORT), Make(0x010F, ASCII ×4 inline — an entry the decoder
    * must SKIP, sitting between the wanted tags), SamplesPerPixel(0x0115,
    * SHORT) — and a zero next-IFD pointer. Every multi-byte field is
    * emitted in the file's OWN byte order, so half the corpus exercises
    * the little-endian path and half the big-endian one. Fixed-tag entry
    * prefixes are precomputed hex literals per endianness; only the SHORT
    * values go through [[leHex]]/[[beHex]].
    */
  private[graft] def tiffHeaderHex(idiv: String): String = {
    def o16(e: String) =
      s"IF(is_le, ${leHex(e, 2, idiv)}, ${beHex(e, 2, idiv)})"
    s"""concat(
       IF(is_le, '49492A0008000000', '4D4D002A00000008'),
       IF(is_le, '0400', '0004'),
       IF(is_le, '0001030001000000', '0100000300000001'), ${o16("w")}, '0000',
       IF(is_le, '0101030001000000', '0101000300000001'), ${o16("h")}, '0000',
       IF(is_le, '0F01020004000000', '010F000200000004'), '47524654',
       IF(is_le, '1501030001000000', '0115000300000001'), ${o16("spp")}, '0000',
       '00000000')"""
  }

  /** M10 — audio-container metadata decode: each text blob is framed in a
    * byte-exact RIFF/WAVE header ([[wavHeaderHex]]) whose fmt chunk does
    * NOT sit at a fixed offset (half the corpus carries a LIST/INFO chunk
    * first), then [[Multimodal.parseWavHeader]] walks the chunk chain the
    * way the RIFF spec demands and extracts channels / sample rate /
    * bits-per-sample. The oracle rebuilds the same blobs and reads the
    * fields by INDEPENDENT byte slicing at the offsets the layout
    * determines — agreement proves the walker, the LE field math, and the
    * never-throw degradation contract end-to-end. Scale shape: header
    * build is a narrow codegen projection; decode reads ≤ 44 header bytes
    * per blob, embarrassingly parallel per partition (m3's contract,
    * extended to the audio lane).
    */
  def m10WavMeta(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").selectExpr(
      "doc_id", "text",
      "1 + doc_id % 2 AS ch",
      "element_at(array(8000, 16000, 22050, 44100, 48000), CAST(doc_id % 5 AS INT) + 1) AS sr",
      "element_at(array(8, 16, 24, 32), CAST((doc_id div 5) % 4 AS INT) + 1) AS bits",
      "(doc_id div 2) % 2 = 1 AS has_list",
      "octet_length(text) AS dlen")
    val blobs = base.select(col("doc_id"),
      expr(s"concat(unhex(${wavHeaderHex("div")}), CAST(text AS BINARY))").as("blob"))
    Multimodal.decodeAudioMeta(blobs).toDF().orderBy("doc_id")
  }

  /** Spec-correct-layout ISO BMFF header hex over columns (v1, ts, dur):
    * `ftyp` (isom + compat brands), a top-level `free` box the outer walk
    * must skip, `moov` containing a `udta` box the NESTED walk must skip
    * and then a minimal `mvhd` carrying version/flags + times + timescale +
    * duration (v0 = 32-bit fields, v1 = 64-bit times and duration — §8.2.2
    * field widths), then a size-0 (to-EOF) `mdat` holding the payload.
    * Box sizes are self-declared, so the minimal mvhd (fields through
    * duration) walks exactly like a full 108/120-byte one.
    */
  private[graft] def mp4HeaderHex(idiv: String): String = {
    def be32(e: String) = beHex(e, 4, idiv)
    def be64(e: String) = beHex(e, 8, idiv)
    s"""concat(
       '0000001866747970', '69736F6D', '00000000', '69736F6D', '6D703432',
       '0000001066726565', '4752414654454E47',
       IF(v1, '00000040', '00000034'), '6D6F6F76',
       '0000001075647461', '4752414654454E47',
       IF(v1,
          concat('000000286D766864', '01000000',
                 '0000000000000000', '0000000000000000',
                 ${be32("ts")}, ${be64("dur")}),
          concat('0000001C6D766864', '00000000',
                 '00000000', '00000000',
                 ${be32("ts")}, ${be32("dur")})),
       '000000006D646174')"""
  }

  /** M12 — MP4/ISO-BMFF metadata decode, the video lane of the container
    * family (images m3/m11, audio m10, video m12). BMFF brings the three
    * decode capabilities the other lanes never combine: NESTED boxes (mvhd
    * lives inside moov — the walk recurses one level), EXTENDED sizes
    * (size == 1 → 64-bit size follows; size == 0 → box runs to EOF), and
    * VERSION-SWITCHED field widths (mvhd v0 = 32-bit times/duration, v1 =
    * 64-bit — half the framed corpus each). The walker must also skip a
    * top-level `free` box and an in-moov `udta` box to reach the payload
    * fields. Oracle rebuilds the blobs and slices timescale/duration at
    * the version-determined offsets — agreement proves outer walk, nested
    * walk, and both version layouts end-to-end. Scale: m3's contract
    * (narrow codegen header build, header-bounded reads, embarrassingly
    * parallel per partition).
    */
  def m12Mp4Meta(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").selectExpr(
      "doc_id", "text",
      "doc_id % 2 = 1 AS v1",
      "element_at(array(600, 1000, 90000, 44100), CAST((doc_id div 2) % 4 AS INT) + 1) AS ts",
      "element_at(array(600, 1000, 90000, 44100), CAST((doc_id div 2) % 4 AS INT) + 1)" +
        " * (1 + doc_id % 60) + doc_id % 7 AS dur")
    val blobs = base.select(col("doc_id"),
      expr(s"concat(unhex(${mp4HeaderHex("div")}), CAST(text AS BINARY))").as("blob"))
    Multimodal.decodeVideoMeta(blobs).toDF().orderBy("doc_id")
  }

  /** M11 — TIFF metadata decode: the endianness-switched container. PNG is
    * big-endian by spec, GIF and WAVE little-endian by spec — TIFF alone
    * declares its byte order per FILE ("II"/"MM", TIFF 6.0 §2), so a
    * decoder needs one code path whose field reads flip at runtime. Half
    * the corpus is framed little-endian and half big-endian
    * ([[tiffHeaderHex]]), each with a 4-entry IFD whose sorted-tag order
    * puts an irrelevant Make entry BETWEEN the wanted tags, and
    * [[Multimodal.parseHeader]] walks the IFD in the declared byte order.
    * The oracle rebuilds the same blobs and slices width/height/spp at the
    * offsets the fixed layout determines, flipping byte significance on
    * `is_le` — agreement proves the sniff, the runtime endianness switch,
    * and the entry walk end-to-end. Scale: m3's contract (narrow codegen
    * header build, ≤ 62-byte reads, embarrassingly parallel).
    */
  def m11TiffMeta(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents").selectExpr(
      "doc_id", "text",
      "doc_id % 2 = 0 AS is_le",
      "16 + doc_id % 1000 AS w",
      "16 + (doc_id div 7) % 800 AS h",
      "element_at(array(1, 3, 4), CAST((doc_id div 3) % 3 AS INT) + 1) AS spp")
    val blobs = base.select(col("doc_id"),
      expr(s"concat(unhex(${tiffHeaderHex("div")}), CAST(text AS BINARY))").as("blob"))
    Multimodal.decodeMeta(blobs).toDF().orderBy("doc_id")
  }

  /** M8 — per-blob byte-distribution diversity (Gini–Simpson over the byte
    * histogram): `1 - Σ c_b² / n²`, the probability two independently drawn
    * bytes differ. This is the cheap compressibility/corruption telemetry a
    * multimodal pipeline runs on opaque blobs it cannot decode: already-
    * compressed media scores near the 255/256 ceiling, text sits far below,
    * zero-padded or truncated blobs crater — all without any codec. (The
    * usual formulation is Shannon entropy; Gini–Simpson carries the same
    * ordering but needs no `log`, which IEEE 754 does NOT require correctly
    * rounded — so this variant is bit-identical across engines while
    * entropy would break the hash gate. Same choice as T10.)
    *
    * Scale shape: byte extraction is a narrow codegen projection (hex once,
    * then 2-char slices — fan-out = blob bytes), the histogram is one
    * (doc, byte)-keyed aggregate whose map-side partials collapse each
    * partition's contribution to ≤ 256 rows per doc before the exchange,
    * and the final doc-keyed reduce sees ≤ 256 rows per doc. The squared
    * sum accumulates in DECIMAL(38,0) — c² of a multi-GB blob's hot byte
    * overflows int64 — and the only division is the final double one.
    */
  def m8ByteDiversity(s: SparkSession, dir: String): DataFrame =
    // Round-15 adjudication (verdict item 5): the per-row sorted-runs
    // reformulation (array_sort the byte tokens, square the run lengths —
    // zero exchanges) was PROTOTYPED, oracle-matched, and MEASURED SLOWER:
    // 3.60 → 7.11 s min-of-4 at sf0.1 (higher-order-function lambdas
    // evaluate interpreted per element and the per-row string sort beats
    // the codegen'd explode + two map-side-combined hash aggregates it
    // replaced). Numbers in OPTIMIZATION_r15.md; the exchange-based
    // histogram below stays.
    t(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .withColumn("h", lower(hex(col("text").cast("binary"))))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(h) - 1, 2), i -> substring(h, CAST(i AS INT), 2))"))
        .as("byte_hex"))
      .groupBy(col("doc_id"), col("byte_hex"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bytes"),
        count(lit(1)).as("n_distinct_bytes"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sum_sq"))
      .select(col("doc_id"), col("n_bytes"), col("n_distinct_bytes"),
        (lit(1.0) - col("sum_sq").cast("double") /
          (col("n_bytes").cast("double") * col("n_bytes").cast("double")))
          .as("byte_diversity"))
      .orderBy("doc_id")

  /** M9 — declared-vs-sniffed format consistency audit: per (source,
    * declared format), how many blobs' leading bytes disagree with the
    * format their metadata claims — the upload-corruption / mislabeled-
    * extension telemetry every media ingest runs (a "image/png" whose magic
    * bytes say MP4 is a corrupt or mislabeled upload, and a source with a
    * high mismatch rate is a broken scraper). The fixture has no metadata
    * column, so the DECLARED format is a deterministic stand-in derived
    * from doc_id (mod 3 over three fake format labels); the SNIFFED class
    * classifies on the UNSIGNED leading UTF-8 byte (`bytes(0) & 0xff`,
    * derived via `hex` because Spark's `ascii` returns the SIGNED first
    * byte and DuckDB's the Unicode codepoint — neither is portable on
    * non-ASCII leading characters) — swap either side for the real
    * metadata column / magic-byte table ([[Multimodal.parseHeader]] is
    * that sniffer) and the plan is unchanged.
    *
    * Scale shape: one narrow projection (first byte only — a real sniffer
    * reads ≤ 16 bytes, never the blob body) and one map-side-combined
    * aggregate to ≤ #sources × 3 rows. The rate is the only division.
    */
  def m9FormatConsistency(s: SparkSession, dir: String): DataFrame = {
    val fmt = (k: Column) => element_at(
      array(lit("img/fake-png"), lit("img/fake-jpeg"), lit("vid/fake-mp4")),
      (k % 3).cast("int") + 1)
    t(s, dir, "documents")
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"),
        fmt(col("doc_id")).as("declared_fmt"),
        fmt(conv(substring(hex(col("text").cast("binary")), 1, 2), 16, 10).cast("long"))
          .as("sniffed_fmt"))
      .groupBy(col("source"), col("declared_fmt"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(when(col("declared_fmt") =!= col("sniffed_fmt"), 1L).otherwise(0L))
          .as("n_mismatch"))
      .withColumn("mismatch_rate",
        col("n_mismatch").cast("double") / col("n_blobs").cast("double"))
      .orderBy("source", "declared_fmt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m9_format_consistency" -> (m9FormatConsistency _),
    "m8_byte_diversity" -> (m8ByteDiversity _),
    "m1_binary_meta" -> (m1BinaryMeta _),
    "m2_frame_sample" -> (m2FrameSample _),
    "m3_decode_meta" -> (m3DecodeMeta _),
    "m4_storage_stats" -> (m4StorageStats _),
    "m5_perceptual_neardup" -> (m5PerceptualNearDup(_, _, 4)),
    "m6_chunk_dedup" -> (m6ChunkDedup _),
    "m7_cdc_chunk_dedup" -> (m7CdcChunkDedup _),
    "m10_wav_meta" -> (m10WavMeta _),
    "m11_tiff_meta" -> (m11TiffMeta _),
    "m12_mp4_meta" -> (m12Mp4Meta _))

  val oracles: Map[String, String] = Map(
    "m12_mp4_meta" ->
      // Rebuilds the exact BMFF blobs (same recipe as mp4HeaderHex with
      // DuckDB's `//` integral division) and reads timescale/duration at
      // the offsets the fixed layout + mvhd version determine (v0: bytes
      // 84/88 as BE32; v1: bytes 92 BE32 / 96 BE64) — the Spark side WALKS
      // the box chain and the nested moov children, so agreement verifies
      // outer walk + nested walk + both version layouts end-to-end.
      s"""WITH base AS (
           SELECT doc_id, text, doc_id % 2 = 1 AS v1,
                  ([600, 1000, 90000, 44100])[CAST((doc_id // 2) % 4 AS INT) + 1] AS ts,
                  ([600, 1000, 90000, 44100])[CAST((doc_id // 2) % 4 AS INT) + 1]
                    * (1 + doc_id % 60) + doc_id % 7 AS dur
           FROM documents),
         blobs AS (
           SELECT doc_id, v1,
                  ${mp4HeaderHex("//")} || hex(encode(text)) AS h
           FROM base)
         SELECT doc_id,
                CAST(length(h) // 2 AS BIGINT) AS n_bytes,
                CASE WHEN substr(h, 9, 8) = '66747970' THEN 'mp4'
                     ELSE 'unknown' END AS format,
                CAST(IF(v1, 1, 0) AS BIGINT) AS version,
                IF(v1, CAST('0x' || substr(h, 185, 8) AS BIGINT),
                       CAST('0x' || substr(h, 169, 8) AS BIGINT)) AS timescale,
                IF(v1, CAST('0x' || substr(h, 193, 16) AS BIGINT),
                       CAST('0x' || substr(h, 177, 8) AS BIGINT)) AS duration
         FROM blobs ORDER BY doc_id""",
    "m11_tiff_meta" ->
      // Rebuilds the exact TIFF blobs (same recipe as tiffHeaderHex with
      // DuckDB's `//` integral division) and reads width/height/spp by
      // INDEPENDENT byte slicing at the offsets the fixed 4-entry layout
      // determines (value fields at bytes 18/30/54), flipping byte
      // significance on is_le — the Spark side WALKS the IFD in the
      // declared byte order, so agreement verifies sniff + runtime
      // endianness switch + entry walk end-to-end.
      s"""WITH base AS (
           SELECT doc_id, text, doc_id % 2 = 0 AS is_le,
                  16 + doc_id % 1000 AS w,
                  16 + (doc_id // 7) % 800 AS h,
                  ([1, 3, 4])[CAST((doc_id // 3) % 3 AS INT) + 1] AS spp
           FROM documents),
         blobs AS (
           SELECT doc_id, is_le,
                  ${tiffHeaderHex("//")} || hex(encode(text)) AS h
           FROM base)
         SELECT doc_id,
                CAST(length(h) // 2 AS BIGINT) AS n_bytes,
                CASE WHEN substr(h, 1, 8) = '49492A00' THEN 'tiff_le'
                     WHEN substr(h, 1, 8) = '4D4D002A' THEN 'tiff_be'
                     ELSE 'unknown' END AS format,
                CAST(IF(is_le,
                        CAST('0x' || substr(h, 37, 2) AS BIGINT)
                          + 256 * CAST('0x' || substr(h, 39, 2) AS BIGINT),
                        256 * CAST('0x' || substr(h, 37, 2) AS BIGINT)
                          + CAST('0x' || substr(h, 39, 2) AS BIGINT))
                     AS BIGINT) AS width,
                CAST(IF(is_le,
                        CAST('0x' || substr(h, 61, 2) AS BIGINT)
                          + 256 * CAST('0x' || substr(h, 63, 2) AS BIGINT),
                        256 * CAST('0x' || substr(h, 61, 2) AS BIGINT)
                          + CAST('0x' || substr(h, 63, 2) AS BIGINT))
                     AS BIGINT) AS height,
                CAST(IF(is_le,
                        CAST('0x' || substr(h, 109, 2) AS BIGINT)
                          + 256 * CAST('0x' || substr(h, 111, 2) AS BIGINT),
                        256 * CAST('0x' || substr(h, 109, 2) AS BIGINT)
                          + CAST('0x' || substr(h, 111, 2) AS BIGINT))
                     AS BIGINT) AS channels
         FROM blobs ORDER BY doc_id""",
    "m10_wav_meta" ->
      // Rebuilds the exact WAVE blobs (same recipe as wavHeaderHex, with
      // DuckDB's `//` integral division) and reads the fmt fields by
      // INDEPENDENT byte slicing: the fmt body's offset is determined by
      // the known chunk layout (12-byte preamble + optional 20-byte LIST),
      // so agreement with the Spark side's general chunk WALK verifies the
      // walker and the little-endian field math end-to-end.
      s"""WITH base AS (
           SELECT doc_id, text,
                  1 + doc_id % 2 AS ch,
                  ([8000, 16000, 22050, 44100, 48000])[CAST(doc_id % 5 AS INT) + 1] AS sr,
                  ([8, 16, 24, 32])[CAST((doc_id // 5) % 4 AS INT) + 1] AS bits,
                  (doc_id // 2) % 2 = 1 AS has_list,
                  octet_length(encode(text)) AS dlen
           FROM documents),
         blobs AS (
           SELECT doc_id, has_list,
                  ${wavHeaderHex("//")} || hex(encode(text)) AS h
           FROM base),
         sliced AS (
           SELECT doc_id, h,
                  2 * (12 + IF(has_list, 20, 0)) + 1 AS o
           FROM blobs)
         SELECT doc_id,
                CAST(length(h) // 2 AS BIGINT) AS n_bytes,
                CASE WHEN substr(h, 1, 8) = '52494646'
                          AND substr(h, 17, 8) = '57415645'
                     THEN 'wav' ELSE 'unknown' END AS format,
                CAST(CAST('0x' || substr(h, o + 20, 2) AS BIGINT)
                   + 256 * CAST('0x' || substr(h, o + 22, 2) AS BIGINT)
                     AS BIGINT) AS channels,
                CAST(CAST('0x' || substr(h, o + 24, 2) AS BIGINT)
                   + 256 * CAST('0x' || substr(h, o + 26, 2) AS BIGINT)
                   + 65536 * CAST('0x' || substr(h, o + 28, 2) AS BIGINT)
                   + 16777216 * CAST('0x' || substr(h, o + 30, 2) AS BIGINT)
                     AS BIGINT) AS sample_rate,
                CAST(CAST('0x' || substr(h, o + 44, 2) AS BIGINT)
                   + 256 * CAST('0x' || substr(h, o + 46, 2) AS BIGINT)
                     AS BIGINT) AS bits_per_sample
         FROM sliced ORDER BY doc_id""",
    "m9_format_consistency" ->
      """WITH f AS (
           SELECT source,
                  ['img/fake-png', 'img/fake-jpeg', 'vid/fake-mp4']
                    [CAST(doc_id % 3 AS INT) + 1] AS declared_fmt,
                  ['img/fake-png', 'img/fake-jpeg', 'vid/fake-mp4']
                    [CAST(CAST('0x' || substr(hex(encode(text)), 1, 2) AS BIGINT) % 3
                      AS INT) + 1] AS sniffed_fmt
           FROM documents WHERE n_chars > 0)
         SELECT source, declared_fmt,
                COUNT(*) AS n_blobs,
                CAST(SUM(CASE WHEN declared_fmt <> sniffed_fmt THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_mismatch,
                CAST(SUM(CASE WHEN declared_fmt <> sniffed_fmt THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mismatch_rate
         FROM f GROUP BY source, declared_fmt ORDER BY source, declared_fmt""",
    "m8_byte_diversity" ->
      """WITH bytes AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, length(h), 2),
                    i -> substr(h, CAST(i AS INT), 2))) AS byte_hex
           FROM (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS h
                 FROM documents WHERE n_chars > 0)),
         counts AS (
           SELECT doc_id, byte_hex, COUNT(*) AS c
           FROM bytes GROUP BY doc_id, byte_hex)
         SELECT doc_id,
                CAST(SUM(c) AS BIGINT) AS n_bytes,
                COUNT(*) AS n_distinct_bytes,
                -- HUGEINT mirrors the Spark plan's DECIMAL(38,0) accumulator:
                -- c² of a multi-GB blob's hot byte overflows int64 (DuckDB
                -- would raise, not wrap), so the oracle is scale-safe too
                1.0 - CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
                  / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
                  AS byte_diversity
         FROM counts GROUP BY doc_id ORDER BY doc_id""",
    "m7_cdc_chunk_dedup" ->
      """WITH pos AS (
           SELECT doc_id, source, text, n_chars, unnest(range(8, n_chars + 1)) AS i
           FROM documents WHERE n_chars >= 8),
         hashed AS (
           SELECT doc_id, source, text, i,
             (CAST(ascii(substr(text, CAST(i-7 AS INT), 1)) AS BIGINT) * 27512614111
            + CAST(ascii(substr(text, CAST(i-6 AS INT), 1)) AS BIGINT) * 887503681
            + CAST(ascii(substr(text, CAST(i-5 AS INT), 1)) AS BIGINT) * 28629151
            + CAST(ascii(substr(text, CAST(i-4 AS INT), 1)) AS BIGINT) * 923521
            + CAST(ascii(substr(text, CAST(i-3 AS INT), 1)) AS BIGINT) * 29791
            + CAST(ascii(substr(text, CAST(i-2 AS INT), 1)) AS BIGINT) * 961
            + CAST(ascii(substr(text, CAST(i-1 AS INT), 1)) AS BIGINT) * 31
            + CAST(ascii(substr(text, CAST(i   AS INT), 1)) AS BIGINT)) % 64 AS hmod
           FROM pos),
         cuts AS (
           SELECT doc_id, source, text, i AS cut,
                  lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS prev
           FROM hashed WHERE hmod = 0),
         body AS (
           SELECT source, substr(text, CAST(prev + 1 AS INT), CAST(cut - prev AS INT)) AS chunk
           FROM cuts),
         tails AS (
           SELECT d.source, substr(d.text, CAST(COALESCE(m.mx, 0) + 1 AS INT)) AS chunk
           FROM documents d
           LEFT JOIN (SELECT doc_id, MAX(i) AS mx FROM hashed WHERE hmod = 0
                      GROUP BY doc_id) m ON d.doc_id = m.doc_id
           WHERE d.n_chars > 0 AND COALESCE(m.mx, 0) < d.n_chars),
         allc AS (SELECT source, md5(chunk) AS chunk_md5, length(chunk) AS clen
                  FROM (SELECT * FROM body UNION ALL SELECT * FROM tails)),
         per_chunk AS (
           SELECT source, chunk_md5, MAX(clen) AS clen, COUNT(*) AS copies
           FROM allc GROUP BY source, chunk_md5)
         SELECT source,
                CAST(SUM(copies) AS BIGINT) AS n_chunks,
                COUNT(*) AS n_distinct_chunks,
                CAST(SUM(copies * clen) AS BIGINT) AS total_chars,
                CAST(SUM(clen) AS BIGINT) AS deduped_chars,
                1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(copies) AS DOUBLE)
                  AS chunk_dedup_ratio
         FROM per_chunk GROUP BY source ORDER BY source""",
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
    "m5_perceptual_neardup" ->
      """WITH frames AS (
           SELECT doc_id, CAST(i AS INT) AS idx,
                  list_sum(list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(substr(text, CAST(i * (n_chars // 32) AS INT) + 1,
                                                      CAST(n_chars // 32 AS INT)), ''),
                      c -> CAST(ascii(c) AS BIGINT)))) AS luma
           FROM (SELECT doc_id, text, n_chars, unnest(range(0, 32)) AS i
                 FROM documents WHERE n_chars >= 32)),
         hashes AS (
           SELECT doc_id,
                  CAST(SUM(CASE WHEN luma * 32 > total
                       THEN (CAST(1 AS BIGINT) << idx) ELSE 0 END) AS BIGINT) AS phash
           FROM (SELECT doc_id, idx, luma,
                        SUM(luma) OVER (PARTITION BY doc_id) AS total
                 FROM frames)
           GROUP BY doc_id),
         banded AS (
           SELECT doc_id, phash, b AS band, (phash >> (b * 8)) & 255 AS bv
           FROM (SELECT doc_id, phash, unnest(range(0, 4)) AS b FROM hashes)),
         cands AS (
           SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                  l.phash AS ha, r.phash AS hb
           FROM banded l JOIN banded r
             ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id)
         SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         FROM cands WHERE bit_count(xor(ha, hb)) <= 4
         ORDER BY doc_a, doc_b""",
    "m6_chunk_dedup" ->
      """WITH chunks AS (
           SELECT source,
                  md5(substr(text, CAST(i * 64 AS INT) + 1, 64)) AS chunk_md5
           FROM (SELECT source, text, unnest(range(0, (n_chars - 1) // 64 + 1)) AS i
                 FROM documents WHERE n_chars > 0)),
         per_chunk AS (
           SELECT source, chunk_md5, COUNT(*) AS copies
           FROM chunks GROUP BY source, chunk_md5)
         SELECT source,
                CAST(SUM(copies) AS BIGINT) AS n_chunks,
                COUNT(*) AS n_distinct_chunks,
                1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(copies) AS DOUBLE)
                  AS chunk_dedup_ratio
         FROM per_chunk GROUP BY source ORDER BY source""",
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
         FROM per_digest GROUP BY source ORDER BY source""",
    "m3_decode_meta" ->
      // Rebuilds the exact container blobs (same header recipe as
      // mediaHeaderHex) and parses them by INDEPENDENT byte slicing at the
      // offsets the PNG/JFIF/GIF specs mandate — the JPEG offsets are valid
      // because this header chain is SOI + 16-byte APP0 + SOF0, which is
      // precisely what the Spark side's general marker scan must also
      // resolve; agreement verifies the walker end-to-end.
      """WITH blobs AS (
           SELECT doc_id,
                  hex(unhex(CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN '89504E470D0A1A0A' || '0000000D' || '49484452'
                      || lpad(hex(16 + doc_id % 1280), 8, '0')
                      || lpad(hex(16 + n_chars % 1024), 8, '0')
                      || '08'
                      || lpad(hex([0, 2, 6][CAST((doc_id // 3) % 3 AS INT) + 1]), 2, '0')
                      || '000000' || '00000000'
                    WHEN 1 THEN 'FFD8' || 'FFE000104A46494600010100000100010000'
                      || 'FFC0'
                      || lpad(hex(8 + 3 * (CASE WHEN (doc_id // 3) % 2 = 0 THEN 3 ELSE 1 END)), 4, '0')
                      || '08'
                      || lpad(hex(16 + n_chars % 1024), 4, '0')
                      || lpad(hex(16 + doc_id % 1280), 4, '0')
                      || lpad(hex(CASE WHEN (doc_id // 3) % 2 = 0 THEN 3 ELSE 1 END), 2, '0')
                      || (CASE WHEN (doc_id // 3) % 2 = 0
                          THEN '011100021101031101' ELSE '011100' END)
                    ELSE '474946383961'
                      || lpad(hex((16 + doc_id % 1280) % 256), 2, '0')
                      || lpad(hex((16 + doc_id % 1280) // 256), 2, '0')
                      || lpad(hex((16 + n_chars % 1024) % 256), 2, '0')
                      || lpad(hex((16 + n_chars % 1024) // 256), 2, '0')
                      || '000000'
                    END) || encode(text)) AS h
           FROM documents),
         sniffed AS (
           SELECT doc_id, CAST(length(h) // 2 AS BIGINT) AS n_bytes, h,
                  CASE
                    WHEN length(h) >= 66 AND substr(h, 1, 16) = '89504E470D0A1A0A'
                         AND substr(h, 25, 8) = '49484452' THEN 'png'
                    WHEN length(h) >= 26
                         AND substr(h, 1, 12) IN ('474946383761', '474946383961') THEN 'gif'
                    WHEN substr(h, 1, 4) = 'FFD8' THEN 'jpeg'
                    ELSE 'unknown' END AS format
           FROM blobs)
         SELECT doc_id, n_bytes, format,
                CAST(CASE format
                  WHEN 'png' THEN CAST('0x' || substr(h, 33, 8) AS BIGINT)
                  WHEN 'jpeg' THEN CAST('0x' || substr(h, 55, 4) AS BIGINT)
                  WHEN 'gif' THEN CAST('0x' || substr(h, 13, 2) AS BIGINT)
                    + 256 * CAST('0x' || substr(h, 15, 2) AS BIGINT)
                  ELSE 0 END AS BIGINT) AS width,
                CAST(CASE format
                  WHEN 'png' THEN CAST('0x' || substr(h, 41, 8) AS BIGINT)
                  WHEN 'jpeg' THEN CAST('0x' || substr(h, 51, 4) AS BIGINT)
                  WHEN 'gif' THEN CAST('0x' || substr(h, 17, 2) AS BIGINT)
                    + 256 * CAST('0x' || substr(h, 19, 2) AS BIGINT)
                  ELSE 0 END AS BIGINT) AS height,
                CAST(CASE format
                  WHEN 'png' THEN CASE substr(h, 51, 2)
                    WHEN '00' THEN 1 WHEN '02' THEN 3 WHEN '03' THEN 1
                    WHEN '04' THEN 2 WHEN '06' THEN 4 ELSE 0 END
                  WHEN 'jpeg' THEN CAST('0x' || substr(h, 59, 2) AS BIGINT)
                  WHEN 'gif' THEN 3
                  ELSE 0 END AS BIGINT) AS channels
         FROM sniffed ORDER BY doc_id""")
}
