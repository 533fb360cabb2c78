package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextSpec extends SparkSuite {

  test("t19: merged vocab states equal the full t16 recompute, for any batch split") {
    import org.apache.spark.sql.functions._
    val full = TextQueries.t16HapaxStats(spark, sf001).collect().map(_.toSeq)
    // the declared parity split
    val merged2 = TextQueries.t19IncrementalVocab(spark, sf001).collect().map(_.toSeq)
    assert(merged2.toSeq == full.toSeq, "parity split drifted from full recompute")
    // a three-way uneven split — merge must be associative over any batching
    val docs = graft.Tables(spark, sf001, "documents")
    val merged3 = TextQueries.t19StatsOf(TextQueries.t19MergeStates(
        TextQueries.t19StateOf(docs.filter(col("doc_id") % 3 === 0)),
        TextQueries.t19StateOf(docs.filter(col("doc_id") % 3 === 1)),
        TextQueries.t19StateOf(docs.filter(col("doc_id") % 3 === 2))))
      .collect().map(_.toSeq)
    assert(merged3.toSeq == full.toSeq, "three-way merge drifted from full recompute")
  }

  test("t3: token counts agree with a driver-side recount on a sample") {
    val sample = graft.Tables(spark, sf001, "documents")
      .select("doc_id", "text").limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextQueries.tokenCount(spark, sf001)
      .filter(col("doc_id") < 20).collect()
    got.foreach { r =>
      val text = sample(r.getLong(0))
      assert(r.getLong(1) == text.split(" ", -1).length, s"ws_tokens doc ${r.getLong(0)}")
      assert(r.getLong(3) == text.length, "n_chars_actual")
    }
  }

  test("t13: novelty stats match a driver-side bigram replay") {
    val rows = TextQueries.t13BigramNovelty(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_distinct_bigrams"), r.getAs[Long]("novel_bigrams"),
        r.getAs[Long]("xdoc_hits"), r.getAs[Double]("novelty_rate"))).toMap
    val docs = graft.Tables(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val docBg: Map[Long, Map[String, Long]] = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      if (ws.length < 2) None
      else Some(id -> ws.sliding(2).map(p => p(0) + " " + p(1)).toSeq
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong })
    }.toMap
    val model: Map[String, Long] = docBg.values.flatten.toSeq
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(rows.keySet == docBg.keySet)
    docBg.foreach { case (id, bg) =>
      val (nb, nd, nov, xd, rate) = rows(id)
      assert(nb == bg.values.sum, s"n_bigrams doc $id")
      assert(nd == bg.size.toLong, s"n_distinct doc $id")
      assert(nov == bg.count { case (k, c) => model(k) == c }.toLong, s"novel doc $id")
      assert(xd == bg.map { case (k, c) => model(k) - c }.sum, s"xdoc doc $id")
      assert(rate == nov.toDouble / nd.toDouble, s"rate doc $id")
    }
    // the corpus contains both boilerplate and novel text: rates span a range
    val rates = rows.values.map(_._5)
    assert(rates.exists(_ > 0.0) && rates.min < rates.max)
  }

  test("t14: oov counts match a driver-side vocab replay") {
    val rows = TextQueries.t14VocabCoverage(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))).toMap
    val docs = graft.Tables(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(256).map(_._1).toSet
    assert(rows.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, ws) =>
      val oov = ws.count(w => !vocab.contains(w)).toLong
      val (nt, no, rate) = rows(id)
      assert(nt == ws.size.toLong, s"n_tokens doc $id")
      assert(no == oov, s"n_oov doc $id")
      assert(rate == oov.toDouble / ws.size.toDouble, s"rate doc $id")
    }
    // a top-256 vocab over a small synthetic vocabulary should cover most
    // tokens: corpus-wide OOV rate stays below 50%
    val (tot, oovTot) = rows.values.foldLeft((0L, 0L)) {
      case ((a, b), (nt, no, _)) => (a + nt, b + no) }
    assert(oovTot.toDouble / tot.toDouble < 0.5)
  }

  test("t15: Misra-Gries summary honors the sketch guarantees vs exact counts") {
    val exact = graft.Tables(spark, sf001, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val n = exact.values.sum
    val k = 64
    val summary = TextQueries.t15Summary(spark, sf001, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.nonEmpty && summary.size <= k)
    // estimates are biased low with bounded error: true - N/(k+1) <= est <= true
    summary.foreach { case (t, est) =>
      val tr = exact.getOrElse(t, 0L)
      assert(est <= tr, s"overestimate for '$t'")
      assert(tr - est <= n / (k + 1), s"error bound for '$t'")
    }
    // any item heavier than N/(k+1) is guaranteed present
    exact.filter(_._2 > n / (k + 1)).keys.foreach { t =>
      assert(summary.contains(t), s"missing guaranteed heavy hitter '$t'")
    }
    // the declared gate query: exact top-10 terms, every MG verdict true
    val top = TextQueries.t15HeavyHitters(spark, sf001).collect()
    assert(top.length == 10)
    val expTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    assert(top.map(r => r.getString(0) -> r.getAs[Long]("cnt")).toSeq == expTop,
      "gate rows must be the exact top-10 (cnt desc, term asc)")
    top.foreach(r => assert(r.getAs[Boolean]("mg_ok"), s"'${r.getString(0)}' MG bound"))
  }

  test("t16: hapax stats match a driver-side replay") {
    val rows = TextQueries.t16HapaxStats(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_hapax"), r.getAs[Double]("hapax_rate"),
        r.getAs[Double]("type_token_ratio"))).toMap
    val docs = graft.Tables(spark, sf001, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (t, v) => t -> v.size.toLong }
      src -> (counts.values.sum, counts.size.toLong,
        counts.count(_._2 == 1L).toLong)
    }
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (src, (nt, ty, hx)) =>
      val (gnt, gty, ghx, hr, ttr) = rows(src)
      assert(gnt == nt && gty == ty && ghx == hx, s"counts $src")
      assert(hr == hx.toDouble / ty.toDouble, s"hapax_rate $src")
      assert(ttr == ty.toDouble / nt.toDouble, s"ttr $src")
    }
  }

  test("t2: ratios are in [0,1] and score components bounded") {
    val rows = TextQueries.quality(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1, "alpha_ratio")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1, "stop_ratio")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0, "quality_score")
    }
  }

  test("t1: predictions are from the closed label set") {
    val langs = TextQueries.langId(spark, sf001)
      .select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "und")))
  }

  test("t7: repetition signals are in range and bigram counts consistent") {
    val rows = TextQueries.repetition(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getLong(1)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1, "dup_tok_ratio in [0,1)")
      if (!r.isNullAt(4)) {
        // a doc with >= 2 tokens has exactly n_tok - 1 bigrams
        assert(r.getLong(4) == nTok - 1, s"n_bigrams ${r.getLong(4)} vs n_tok $nTok")
        assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1, "top_bigram_ratio in (0,1]")
      }
    }
  }

  test("t8: tf-idf emits at most 5 consecutively-ranked terms per doc") {
    val rows = TextQueries.tfidf(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(4) >= 1 && r.getDouble(5) > 0)
    }
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val rnks = rs.map(_.getLong(1)).sorted
      assert(rnks.length <= 5 && rnks.sameElements(1L to rnks.length),
        s"doc $doc ranks ${rnks.mkString(",")}")
    }
  }

  test("t4: fingerprints are stable and collision-free on distinct texts") {
    val df = TextQueries.fingerprint(spark, sf001)
    val n = df.count()
    // sf0.001 documents are all distinct (verified via x1) -> distinct hashes
    assert(df.select("content_sha256").distinct().count() == n)
    val rh = df.select("rolling_hash").collect().map(_.getLong(0))
    assert(rh.forall(h => h >= 0 && h < 1000000007L))
  }

  test("t9: per-source drift agrees with a driver-side share recount") {
    val rows = TextQueries.termDrift(spark, sf001, minCount = 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // ranks dense 1..≤5 per source, drift non-increasing, floor respected
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length), s"$src ranks")
      val drifts = sorted.map(_._6)
      drifts.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$src drift not descending")
        case _ => ()
      }
      assert(rs.forall(_._4 >= 20L))
    }
    // recount one flagged (source, term) from the raw table
    val (src, _, term, cntS, cntC, drift) = rows.head
    val toks = graft.Tables(spark, sf001, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
    val expCntS = toks.filter(col("source") === src && col("term") === term).count()
    val expCntC = toks.filter(col("term") === term).count()
    val totalS = toks.filter(col("source") === src).count()
    val totalC = toks.count()
    assert(cntS == expCntS && cntC == expCntC)
    assert(math.abs(drift - (cntS.toDouble * totalC) / (totalS.toDouble * expCntC)) < 1e-12)
  }

  test("t10: Simpson diversity bounded and consistent with a driver recount") {
    val rows = TextQueries.lexicalDiversity(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd, div) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct_terms"),
        r.getAs[Double]("simpson_diversity"))
      assert(nd >= 1 && nd <= n)
      assert(div >= 0.0 && div < 1.0, s"diversity $div out of range")
    }
    // driver-side recount for one source
    val src = rows.head.getString(0)
    val counts = graft.Tables(spark, sf001, "documents")
      .filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").count().collect().map(_.getLong(1))
    val n = counts.sum.toDouble
    val expected = 1.0 - counts.map(c => c.toDouble * c).sum / (n * n)
    assert(math.abs(rows.head.getAs[Double]("simpson_diversity") - expected) < 1e-12)
  }

  test("t11: hashed-classifier scores match a JVM md5 replay exactly") {
    val rows = TextQueries.hashedClassifier(spark, sf001).collect()
    assert(rows.nonEmpty)
    def weight(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % 1024L) % 21L - 10L
    }
    val texts = graft.Tables(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val raw = toks.map(weight).sum
      assert(r.getAs[Long]("raw_score") == raw,
        s"doc ${r.getLong(0)}: ${r.getAs[Long]("raw_score")} vs replay $raw")
      assert(r.getAs[Long]("n_tok") == toks.length)
      assert(r.getAs[Int]("keep") == (if (raw > 0) 1 else 0))
      assert(math.abs(r.getAs[Double]("clf_score") - raw.toDouble / (toks.length * 10.0)) < 1e-12)
    }
  }

  test("t17: pattern counts match a JVM-regex replay of the framing recipe") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}".r
    val url = "https?://[A-Za-z0-9./_-]+".r
    val longnum = "[0-9]{6,}".r
    val docs = graft.Tables(spark, sf001, "documents")
      .select("doc_id", "source", "text").collect()
    assert(docs.nonEmpty)
    val expect = docs.groupBy(_.getString(1)).map { case (src, rows) =>
      val per = rows.map { r =>
        val id = r.getLong(0)
        val body = r.getString(2) + ((id % 3) match {
          case 0 => s" contact user$id@mail-${id % 7}.example.com now"
          case 1 => s" fetch https://host-${id % 5}.example.org/path/$id today"
          case _ => s" ref id ${100000 + id * 37} done"
        })
        (email.findAllIn(body).size.toLong, url.findAllIn(body).size.toLong,
          longnum.findAllIn(body).size.toLong)
      }
      src -> (rows.length.toLong,
        per.count(_._1 > 0).toLong, per.map(_._1).sum,
        per.count(_._2 > 0).toLong, per.map(_._2).sum,
        per.count(_._3 > 0).toLong, per.map(_._3).sum)
    }
    val got = TextQueries.t17PatternScan(spark, sf001).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toMap
    assert(got == expect, "pattern scan diverged from the JVM replay")
    // the framing actually exercises every pattern class
    val totals = got.values.toSeq
    assert(totals.map(_._3).sum > 0 && totals.map(_._5).sum > 0 && totals.map(_._7).sum > 0)
  }

  test("t12: top pairs match a driver-side BPE pair recount exactly") {
    val texts = graft.Tables(spark, sf001, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ", -1).filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    })
    val expect = counts.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    val got = TextQueries.t12BpePairStats(spark, sf001).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("t20: chunk grid covers every token, overlaps by window-stride, hashes the exact text") {
    import spark.implicits._
    val text100 = (0 until 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, text100),          // 100 tokens → 13 chunks at 10/8
      (2L, "a b c"),          // shorter than the window → exactly 1 chunk
      (3L, "")                // empty text → split yields [""] → 1 chunk
    ).toDF("doc_id", "text")
    val got = TextQueries.ragChunksOf(docs, window = 10, stride = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L)
    // count: 1 + ceil((100-10)/8) = 13; starts advance by the stride
    assert(d1.length == 13)
    assert(d1.map(_._3).toSeq == (0 until 13).map(_ * 8L))
    // the last chunk is the only ragged one and still reaches the last token
    assert(d1.dropRight(1).forall(_._4 == 10L) && d1.last._4 == 4L)
    assert(d1.last._3 + d1.last._4 == 100L, "tail tokens must be covered")
    // hashes are over the exact reconstructed chunk text
    val toks = text100.split(" ")
    d1.foreach { case (_, cid, start, n, h) =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.slice(start.toInt, start.toInt + n.toInt).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h == expect, s"chunk $cid hash mismatch")
    }
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L,
      got.filter(_._1 == 2L).head._5)))
    assert(got.count(_._1 == 3L) == 1)
  }
}
