package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("m3: typed header decode covers every doc with spec-parsed metadata") {
    val meta = MultimodalQueries.m3DecodeMeta(spark, sf001)
    val docs = graft.Tables(spark, sf001, "documents")
    assert(meta.count() == docs.count())
    val rows = meta.collect()
    rows.foreach { r =>
      val f = r.getAs[String]("format")
      assert(Set("png", "jpeg", "gif")(f), s"unexpected format $f")
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      assert(w >= 16 && w < 1296, s"width $w outside the framed range")
      assert(h >= 16 && h < 1040, s"height $h outside the framed range")
      assert(Set(1L, 2L, 3L, 4L)(r.getAs[Long]("channels")))
      assert(r.getAs[Long]("n_bytes") > 0)
    }
    // the doc_id mod-3 frame rotation must exercise all three containers
    assert(rows.map(_.getAs[String]("format")).toSet == Set("png", "jpeg", "gif"))
  }

  test("m8: byte diversity matches a driver-side histogram replay") {
    val rows = MultimodalQueries.m8ByteDiversity(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bytes"),
        r.getAs[Long]("n_distinct_bytes"), r.getAs[Double]("byte_diversity"))).toMap
    val docs = graft.Tables(spark, sf001, "documents")
      .filter(col("n_chars") > 0).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val counts = bytes.groupBy(identity).map(_._2.length.toLong)
      val n = bytes.length.toLong
      val sumSq = counts.map(c => c * c).sum
      val (nb, nd, div) = rows(id)
      assert(nb == n, s"n_bytes doc $id")
      assert(nd == counts.size.toLong, s"n_distinct doc $id")
      assert(div == 1.0 - sumSq.toDouble / (n.toDouble * n.toDouble), s"diversity doc $id")
      assert(div >= 0.0 && div < 1.0)
    }
  }

  test("m9: mismatch telemetry matches a driver replay of the unsigned-byte sniff rule") {
    val rows = MultimodalQueries.m9FormatConsistency(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_blobs"), r.getAs[Long]("n_mismatch"),
          r.getAs[Double]("mismatch_rate"))).toMap
    val fmts = Seq("img/fake-png", "img/fake-jpeg", "vid/fake-mp4")
    val docs = graft.Tables(spark, sf001, "documents")
      .filter(col("n_chars") > 0).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(d => (d._2, fmts((d._1 % 3).toInt))).map {
      case (k, ds) =>
        // unsigned first UTF-8 byte — the rule both engines derive via hex,
        // exact even when the leading character is non-ASCII (multi-byte)
        val mism = ds.count(d => fmts((d._3.getBytes("UTF-8")(0) & 0xff) % 3) != k._2).toLong
        k -> (ds.size.toLong, mism)
    }
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (k, (n, m)) =>
      val (gn, gm, rate) = rows(k)
      assert(gn == n, s"n_blobs $k")
      assert(gm == m, s"n_mismatch $k")
      assert(rate == m.toDouble / n.toDouble, s"rate $k")
    }
    // the stand-in declared type and the content sniff are independent mod-3
    // draws, so mismatches must exist (≈2/3 of blobs) without being universal
    val (tot, mis) = rows.values.foldLeft((0L, 0L)) {
      case ((a, b), (n, m, _)) => (a + n, b + m) }
    assert(mis > 0 && mis < tot)
  }

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("header decode is deterministic") {
    val bytes = "hello world".getBytes("UTF-8")
    assert(Multimodal.parseHeader(1L, bytes) == Multimodal.parseHeader(1L, bytes))
  }

  test("m3 golden values: real container headers decode to spec-mandated fields") {
    // PNG, 2×3 truecolour+alpha: signature, IHDR length 13, width/height
    // BE32, bit depth 8, colour type 6 (RGBA → 4 channels), real CRC32 of
    // the chunk type+data per the PNG spec (the parser reads fields, not
    // the CRC — but the fixture is byte-honest).
    val ihdr = hx("49484452 00000002 00000003 08 06 000000")
    val crc = new java.util.zip.CRC32(); crc.update(ihdr)
    val png = hx("89504E470D0A1A0A 0000000D") ++ ihdr ++
      hx(f"${crc.getValue}%08X")
    assert(Multimodal.parseHeader(3L, png) == MediaHeader(3L, 33L, "png", 2L, 3L, 4L))
    // JPEG 640×480 3-component, with a COM segment BETWEEN APP0 and SOF0 —
    // the marker walk must skip it by its declared length, which a
    // fixed-offset slicer cannot (ISO 10918-1 §B.2.4.5)
    val jpeg = hx("FFD8" +
      "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" + // APP0/JFIF, 16 bytes
      "FFFE 0004 4849" + // COM "HI"
      "FFC0 0011 08 01E0 0280 03 011100 021101 031101") // SOF0: 480 × 640 × 3
    assert(Multimodal.parseHeader(7L, jpeg) ==
      MediaHeader(7L, jpeg.length.toLong, "jpeg", 640L, 480L, 3L))
    // GIF89a 320×200: little-endian logical screen descriptor
    val gif = hx("474946383961 4001 C800 00 00 00")
    assert(Multimodal.parseHeader(9L, gif) == MediaHeader(9L, 13L, "gif", 320L, 200L, 3L))
    // non-media bytes and truncated magic degrade to unknown, never throw
    assert(Multimodal.parseHeader(1L, "plain text".getBytes("UTF-8")) ==
      MediaHeader(1L, 10L, "unknown", 0L, 0L, 0L))
    assert(Multimodal.parseHeader(2L, hx("89504E470D0A1A0A")) ==
      MediaHeader(2L, 8L, "unknown", 0L, 0L, 0L))
    assert(Multimodal.parseHeader(4L, Array.empty[Byte]) ==
      MediaHeader(4L, 0L, "unknown", 0L, 0L, 0L))
    // truncated JPEG: SOI + APP0 but the stream ends before any SOF
    assert(Multimodal.parseHeader(5L,
      hx("FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00")).format == "unknown")
  }

  test("decoder fuzz: every container walker survives random and mutated bytes (never-throw)") {
    val rnd = new scala.util.Random(0x6d656469L)
    val magics = Seq[Array[Byte]](
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      Array(0xff, 0xd8).map(_.toByte), // JPEG SOI
      "GIF89a".getBytes("US-ASCII"),
      Array('I', 'I', 0x2a, 0x00).map(_.toByte),
      Array('M', 'M', 0x00, 0x2a).map(_.toByte),
      "RIFF".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 24) ++ "ftyp".getBytes("US-ASCII"))
    def decodeAll(id: Long, b: Array[Byte]): Unit = {
      // never throw, and the degraded format field stays well-defined
      assert(Multimodal.parseHeader(id, b).format != null)
      assert(Multimodal.parseWavHeader(id, b).format != null)
      assert(Multimodal.parseMp4Header(id, b).format != null)
    }
    for (trial <- 1 to 300) {
      val n = rnd.nextInt(80)
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      decodeAll(trial.toLong, junk)
      // magic-prefixed junk drives the walkers into their length/offset
      // arithmetic with garbage fields — the crash surface that matters
      val magic = magics(rnd.nextInt(magics.length))
      decodeAll(1000L + trial, magic ++ junk)
      // truncations of a VALID container at every possible length
      if (trial <= magics.length) decodeAll(2000L + trial, magic)
    }
    // byte-flip mutations of structurally valid blobs (sizes/offsets hit)
    def flips(valid: Array[Byte], base: Long): Unit =
      for (_ <- 1 to 100) {
        val b = valid.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        decodeAll(base + rnd.nextInt(1000), b)
      }
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 06 000000 00000000")
    flips(png, 10000L)
  }

  test("m11 golden values: TIFF IFD walk in both byte orders; corrupt blobs degrade") {
    def num(v: Long, n: Int, le: Boolean): Array[Byte] = {
      val bs = (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte)
      (if (le) bs else bs.reverse).toArray
    }
    def entry(tag: Int, typ: Int, cnt: Long, valueField: Array[Byte], le: Boolean): Array[Byte] =
      num(tag, 2, le) ++ num(typ, 2, le) ++ num(cnt, 4, le) ++ valueField
    def short(v: Long, le: Boolean): Array[Byte] = num(v, 2, le) ++ Array[Byte](0, 0)
    def tiff(w: Long, h: Long, spp: Long, le: Boolean): Array[Byte] = {
      val mark: Array[Byte] = if (le) Array('I', 'I', 0x2a, 0x00).map(_.toByte)
        else Array('M', 'M', 0x00, 0x2a).map(_.toByte)
      mark ++ num(8, 4, le) ++ num(4, 2, le) ++
        entry(0x0100, 3, 1, short(w, le), le) ++
        entry(0x0101, 3, 1, short(h, le), le) ++
        entry(0x010f, 2, 4, "GRFT".getBytes("US-ASCII"), le) ++ // must be skipped
        entry(0x0115, 3, 1, short(spp, le), le) ++
        num(0, 4, le)
    }
    val lit = tiff(640, 480, 3, le = true)
    assert(Multimodal.parseHeader(1L, lit) ==
      MediaHeader(1L, lit.length.toLong, "tiff_le", 640L, 480L, 3L))
    val big = tiff(1024, 768, 4, le = false)
    assert(Multimodal.parseHeader(2L, big) ==
      MediaHeader(2L, big.length.toLong, "tiff_be", 1024L, 768L, 4L))
    // LONG-typed (type 4) dimension entries read the full value field
    val longDims: Array[Byte] =
      Array('I', 'I', 0x2a, 0x00).map(_.toByte) ++ num(8, 4, le = true) ++
        num(2, 2, le = true) ++
        entry(0x0100, 4, 1, num(70000, 4, le = true), le = true) ++
        entry(0x0101, 4, 1, num(90000, 4, le = true), le = true) ++
        num(0, 4, le = true)
    val ld = Multimodal.parseHeader(3L, longDims)
    assert(ld.width == 70000L && ld.height == 90000L &&
      ld.channels == 1L, "LONG dims + default SamplesPerPixel") // spec default
    // degradation contract: wrong magic, truncated IFD, IFD past the blob
    assert(Multimodal.parseHeader(4L, Array('I', 'I', 0x2b, 0x00).map(_.toByte)
      ++ num(8, 4, le = true)).format == "unknown")
    assert(Multimodal.parseHeader(5L, lit.take(9)).format == "unknown")
    assert(Multimodal.parseHeader(6L, Array('M', 'M', 0x00, 0x2a).map(_.toByte)
      ++ num(4096, 4, le = false)).format == "unknown")
    // entry table declared longer than the blob
    assert(Multimodal.parseHeader(7L, Array('I', 'I', 0x2a, 0x00).map(_.toByte)
      ++ num(8, 4, le = true) ++ num(40, 2, le = true)).format == "unknown")
    // count > 1: the value field holds a file OFFSET (or packed values),
    // never THE value — a count=2 SHORT entry for ImageWidth must be left
    // unparsed instead of fabricating width=9999 from the offset bytes
    val multiCount: Array[Byte] =
      Array('I', 'I', 0x2a, 0x00).map(_.toByte) ++ num(8, 4, le = true) ++
        num(3, 2, le = true) ++
        entry(0x0100, 3, 2, num(9999, 4, le = true), le = true) ++ // offset, not width
        entry(0x0101, 3, 1, short(222, le = true), le = true) ++
        entry(0x0115, 4, 3, num(12345, 4, le = true), le = true) ++ // offset, not spp
        num(0, 4, le = true)
    val mc = Multimodal.parseHeader(8L, multiCount)
    assert(mc.format == "tiff_le" && mc.width == 0L && mc.height == 222L &&
      mc.channels == 1L, s"count>1 entries must be unparsed, got $mc")
  }

  test("m12 golden values: BMFF nested box walk, both mvhd versions, extended sizes; corrupt blobs degrade") {
    def be(v: Long, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be(8L + body.length, 4) ++ tag(typ) ++ body
    val ftyp = box("ftyp", tag("isom") ++ be(0, 4) ++ tag("isommp42"))
    def mvhd0(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", be(0, 4) ++ be(0, 4) ++ be(0, 4) ++ be(ts, 4) ++ be(dur, 4))
    def mvhd1(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++ be(ts, 4) ++ be(dur, 8))
    // v0, with a free box at top level and a udta box inside moov
    val v0 = ftyp ++ box("free", tag("GRAFTENG")) ++
      box("moov", box("udta", tag("GRAFTENG")) ++ mvhd0(90000, 123456)) ++
      box("mdat", tag("payload"))
    assert(Multimodal.parseMp4Header(1L, v0) ==
      VideoHeader(1L, v0.length.toLong, "mp4", 0L, 90000L, 123456L))
    // v1: 64-bit times and duration (value above 2^32 proves the BE64 read)
    val bigDur = (1L << 33) + 5L
    val v1 = ftyp ++ box("moov", mvhd1(600, bigDur))
    assert(Multimodal.parseMp4Header(2L, v1) ==
      VideoHeader(2L, v1.length.toLong, "mp4", 1L, 600L, bigDur))
    // EXTENDED size: a size==1 box with a 64-bit size field before moov
    val extBody = tag("GRAFTENG")
    val ext = be(1, 4) ++ tag("skip") ++ be(16L + extBody.length, 8) ++ extBody
    val withExt = ftyp ++ ext ++ box("moov", mvhd0(1000, 777))
    assert(Multimodal.parseMp4Header(3L, withExt) ==
      VideoHeader(3L, withExt.length.toLong, "mp4", 0L, 1000L, 777L))
    // degradation contract: no ftyp, moov-less, truncated mvhd, corrupt size
    assert(Multimodal.parseMp4Header(4L, tag("plain text bytes")).format == "unknown")
    assert(Multimodal.parseMp4Header(5L, ftyp ++ box("mdat", tag("x"))).format == "unknown")
    val shortMvhd = ftyp ++ box("moov", box("mvhd", be(0, 4) ++ be(0, 4)))
    assert(Multimodal.parseMp4Header(6L, shortMvhd).format == "unknown")
    val badSize = ftyp ++ be(3, 4) ++ tag("junk") // declared size < 8
    assert(Multimodal.parseMp4Header(7L, badSize).format == "unknown")
    val overSize = ftyp ++ be(1 << 20, 4) ++ tag("moov") // size past EOF
    assert(Multimodal.parseMp4Header(8L, overSize).format == "unknown")
  }

  test("m10 golden values: WAV chunk walk finds fmt behind a LIST chunk; corrupt blobs degrade") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def fmtChunk(ch: Int, sr: Int, bits: Int): Array[Byte] =
      tag("fmt ") ++ le(16, 4) ++ le(1, 2) ++ le(ch, 2) ++ le(sr, 4) ++
        le(sr.toLong * ch * bits / 8, 4) ++ le(ch * bits / 8, 2) ++ le(bits, 2)
    def wav(preChunks: Array[Byte], ch: Int, sr: Int, bits: Int): Array[Byte] = {
      val body = tag("WAVE") ++ preChunks ++ fmtChunk(ch, sr, bits) ++
        tag("data") ++ le(4, 4) ++ Array[Byte](1, 2, 3, 4)
      tag("RIFF") ++ le(body.length.toLong, 4) ++ body
    }
    // fmt directly after the preamble
    val plain = Multimodal.parseWavHeader(1L, wav(Array.empty, 2, 44100, 16))
    assert(plain == AudioHeader(1L, plain.n_bytes, "wav", 2L, 44100L, 16L))
    // fmt behind a LIST chunk — the walk must hop it by its declared size
    val list = tag("LIST") ++ le(12, 4) ++ tag("INFO") ++ tag("GRAFTENG")
    val walked = Multimodal.parseWavHeader(2L, wav(list, 1, 8000, 24))
    assert(walked.format == "wav" && walked.channels == 1L &&
      walked.sample_rate == 8000L && walked.bits_per_sample == 24L)
    // an ODD-sized unknown chunk must advance by its padded (even) size
    val odd = tag("junk") ++ le(3, 4) ++ Array[Byte](9, 9, 9, 0)
    val padded = Multimodal.parseWavHeader(3L, wav(odd, 2, 48000, 32))
    assert(padded.format == "wav" && padded.sample_rate == 48000L)
    // degradation contract: truncated, non-RIFF, fmt-less, corrupt-size
    val good = wav(Array.empty, 2, 44100, 16)
    assert(Multimodal.parseWavHeader(4L, good.take(10)).format == "unknown")
    assert(Multimodal.parseWavHeader(5L, tag("RIFX") ++ good.drop(4)).format == "unknown")
    val noFmt = tag("RIFF") ++ le(12, 4) ++ tag("WAVE") ++
      tag("data") ++ le(4, 4) ++ Array[Byte](1, 2, 3, 4)
    assert(Multimodal.parseWavHeader(6L, noFmt).format == "unknown")
    val badSize = tag("RIFF") ++ le(100, 4) ++ tag("WAVE") ++
      tag("junk") ++ le(0xfffffff0L, 4) ++ Array[Byte](0)
    assert(Multimodal.parseWavHeader(7L, badSize).format == "unknown")
  }

  test("m10: framed corpus decodes all-wav with the deterministic field recipe") {
    val rows = MultimodalQueries.m10WavMeta(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") == "wav")
      assert(r.getAs[Long]("channels") == 1 + id % 2)
      assert(r.getAs[Long]("sample_rate") ==
        Seq(8000L, 16000L, 22050L, 44100L, 48000L)((id % 5).toInt))
      assert(r.getAs[Long]("bits_per_sample") ==
        Seq(8L, 16L, 24L, 32L)(((id / 5) % 4).toInt))
    }
  }

  test("decode setup amortizes once per partition (mapInPandas batch contract)") {
    // count per-partition initializations with an accumulator: a per-row
    // decoder construction bug would show n_init == n_rows
    val inits = spark.sparkContext.longAccumulator("decoder_inits")
    import spark.implicits._
    val blobs = graft.Tables(spark, sf001, "documents")
      .select(col("doc_id").cast("long"), col("text").cast("binary").as("blob"))
      .repartition(4)
      .as[(Long, Array[Byte])]
    val n = blobs.mapPartitions { it =>
      inits.add(1) // ≙ decoder construction in Multimodal.decodeMeta
      it.map { case (id, bytes) => Multimodal.parseHeader(id, bytes) }
    }.count()
    assert(n > 4)
    assert(inits.value == 4, s"expected 4 partition inits, got ${inits.value}")
  }

  test("m4: storage stats are conservation-consistent") {
    val rows = MultimodalQueries.m4StorageStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables(spark, sf001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_blobs")).sum == docs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_blobs") <= r.getAs[Long]("n_blobs"))
      assert(r.getAs[Long]("deduped_bytes") <= r.getAs[Long]("total_bytes"))
      val sr = r.getAs[Double]("savings_ratio")
      assert(sr >= 0.0 && sr < 1.0)
    }
  }

  test("m2: frame offsets are strided and within bounds") {
    val rows = MultimodalQueries.m2FrameSample(spark, sf001)
      .groupBy("doc_id").agg(max("frame_off").as("mx"), count(lit(1)).as("n"))
      .join(graft.Tables(spark, sf001, "documents"), "doc_id")
      .collect()
    rows.foreach { r =>
      val mx = r.getAs[Long]("mx"); val nchars = r.getAs[Long]("n_chars")
      assert(mx < nchars, s"offset $mx beyond $nchars")
      assert(r.getAs[Long]("n") == (nchars + 49) / 50, "stride count")
    }
  }

  test("m5: hamming bounded, blocking stays sub-quadratic, planted near-dups recalled") {
    val pairs = MultimodalQueries.m5PerceptualNearDup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case ((a, b), h) =>
      assert(a < b, "pair not canonically ordered")
      assert(h >= 0 && h <= 4, s"hamming $h outside the cut")
    }
    val n = graft.Tables(spark, sf001, "documents").count()
    assert(pairs.size < n * n / 100, "banded blocking should prune far below all-pairs")
    // recall: most planted near-dup pairs (x4 ground truth) share the coarse
    // intensity profile; length-shifted ones may legitimately miss
    val planted = graft.dedup.DedupQueries.x4NgramJaccard(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(planted.nonEmpty)
    val recalled = planted.count(pairs.contains)
    assert(recalled * 2 >= planted.length,
      s"perceptual recall too low: $recalled of ${planted.length} planted pairs")
  }

  test("m6: chunk totals tie out to per-doc ceil(n_chars/64) and dedup ratio is consistent") {
    val rows = MultimodalQueries.m6ChunkDedup(spark, sf001).collect()
    assert(rows.nonEmpty)
    val expTotals = graft.Tables(spark, sf001, "documents")
      .filter(col("n_chars") > 0)
      .groupBy("source")
      .agg(sum(expr("(n_chars - 1) div 64 + 1")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, n, nd, ratio) = (r.getString(0), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_distinct_chunks"), r.getAs[Double]("chunk_dedup_ratio"))
      assert(n == expTotals(src), s"$src: $n chunks vs expected ${expTotals(src)}")
      assert(nd >= 1 && nd <= n)
      assert(math.abs(ratio - (1.0 - nd.toDouble / n.toDouble)) < 1e-12)
    }
    assert(rows.map(_.getString(0)).toSet == expTotals.keySet)
  }

  test("m7: CDC chunks reconstruct every doc and re-sync after a prepend") {
    val docs = graft.Tables(spark, sf001, "documents")
    val chunked = MultimodalQueries.cdcChunked(docs)
      .select(col("doc_id"), col("text"), col("chunks")).collect()
    chunked.foreach { r =>
      assert(r.getSeq[String](2).mkString("") == r.getString(1),
        s"doc ${r.getLong(0)} reconstructs")
    }
    // Insertion robustness — the property fixed-size chunking (m6) lacks:
    // prepend one char to every doc; boundaries re-sync at the next content
    // cut, so nearly all chunk digests survive the shift.
    val orig = chunked.map(r => r.getLong(0) -> r.getSeq[String](2).toSet).toMap
    val shifted = MultimodalQueries.cdcChunked(
        docs.withColumn("text", concat(lit("Z"), col("text")))
          .withColumn("n_chars", col("n_chars") + 1))
      .select(col("doc_id"), col("chunks")).collect()
    val fracs = shifted.map { r =>
      val o = orig(r.getLong(0))
      r.getSeq[String](1).toSet.intersect(o).size.toDouble / o.size
    }
    assert(fracs.sum / fracs.length > 0.8,
      f"mean shared-chunk fraction ${fracs.sum / fracs.length}%.3f after prepend")
  }

  test("m7: chunk totals conserve characters per source") {
    val got = MultimodalQueries.m7CdcChunkDedup(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = graft.Tables(spark, sf001, "documents")
      .groupBy(col("source")).agg(sum(col("n_chars")).as("chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "total_chars per source == sum(n_chars)")
  }
}
