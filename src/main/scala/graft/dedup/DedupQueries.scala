package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for the LLM-data-pipeline surface: exact
  * (hash-groupBy), MinHash+LSH near-dup, SimHash fingerprints, and
  * inverted-index n-gram Jaccard. All are shuffle-on-key DataFrame plans —
  * the shapes that scale to 100 TB because nothing ever materializes an
  * all-pairs cross join: exact dedup shuffles by content hash, LSH shuffles
  * by (band, band_hash), and the Jaccard join shuffles by shingle.
  *
  * Cross-engine determinism: every hash is derived from md5 hex (identical
  * in Spark and DuckDB) reduced into 61-bit integer arithmetic mod P=1e9+7,
  * so the oracle runs the *same algorithm* in SQL.
  */
object DedupQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val P = 1000000007L
  val NumHashes = 24
  val BandRows = 3 // 8 bands × 3 rows

  /** 60-bit integer from the first 15 hex chars of md5, mod P. */
  private def md5Mod(c: Column): Column =
    (conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P).as("base")

  /** Distinct 3-gram word shingles per document: explode-based, so the
    * (doc, shingle) stream partitions by shingle for inverted-index joins.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(ws, i, $n)))")).as("shingle"))
      .distinct()

  /** X1 — exact dedup via content hash: canonical doc per sha256(text)
    * group, plus the duplicate count. One hash-partitioned aggregate.
    */
  def x1ExactDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("content_hash"), col("n_copies"))
      .orderBy("canonical_id")

  /** X2 — MinHash+LSH near-duplicate pairs, verified by exact Jaccard.
    *
    * shingle → 24 minhashes (universal hashing over a md5-derived base) →
    * 8 bands of 3 → bucket join on (band, band_hash) → candidate pairs →
    * exact 3-gram Jaccard ≥ 0.8. The only joins are equi-joins on band
    * buckets and shingles; candidate cardinality, not corpus², bounds cost.
    */
  def x2MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(t(s, dir, "documents")).cache()
    val hashed = sh.withColumn("base", md5Mod(col("shingle")))
    val ks = explode(expr(s"sequence(0, ${NumHashes - 1})")).as("k")
    val minhash = hashed
      .select(col("doc_id"), col("base"), ks)
      .withColumn("h",
        (((col("k") * lit(2654435761L) + 1) % P) * col("base") +
          (col("k") * lit(40503L) + 17) % P) % P)
      .groupBy(col("doc_id"), col("k"))
      .agg(min(col("h")).as("m"))
    val bands = minhash
      .withColumn("band", expr(s"k div $BandRows"))
      .withColumn("w",
        when(col("k") % BandRows === 0, lit(1L))
          .when(col("k") % BandRows === 1, lit(8191L))
          .otherwise(lit(67092481L)))
      .groupBy(col("doc_id"), col("band"))
      .agg((sum((col("m") * col("w")) % P) % P).as("bh"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    jaccardOfPairs(cand, sh).filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact Jaccard over distinct shingle sets for given (doc_a, doc_b)
    * pairs, via a shingle-equi-join intersection count.
    */
  private def jaccardOfPairs(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("s1"), col("doc_a") === col("s1.doc_id"))
      .join(sh.as("s2"),
        col("doc_b") === col("s2.doc_id") && col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("ni").cast("double") / (col("na.n") + col("nb.n") - col("ni")))
          .as("jaccard"))
  }

  /** X3 — 64-bit SimHash fingerprint per document, emitted as two 32-bit
    * halves (hi, lo) to stay inside signed-int64 arithmetic in both engines.
    * Token bit contributions come from md5 nibbles; the per-bit vote is an
    * order-independent grouped sum.
    */
  def x3Simhash(s: SparkSession, dir: String): DataFrame = {
    val tokens = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .withColumn("hx", md5(col("tok")))
    // vote on bit b of token-hash nibble b/4: (nibble >> (b % 4)) & 1
    val voted = tokens
      .select(col("doc_id"), col("hx"), explode(expr("sequence(0, 63)")).as("bit"))
      .withColumn("nibble",
        expr("CAST(conv(substring(hx, CAST(bit DIV 4 AS INT) + 1, 1), 16, 10) AS BIGINT)"))
      .withColumn("vote",
        expr("CASE WHEN (shiftright(nibble, CAST(bit % 4 AS INT)) & 1) = 1 THEN 1 ELSE -1 END"))
    voted
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .withColumn("onb", (col("v") > 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(expr("CASE WHEN bit >= 32 THEN onb * shiftleft(CAST(1 AS BIGINT), CAST(bit - 32 AS INT)) ELSE 0 END"))
          .as("simhash_hi"),
        sum(expr("CASE WHEN bit < 32 THEN onb * shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE 0 END"))
          .as("simhash_lo"))
      .orderBy("doc_id")
  }

  /** X4 — inverted-index n-gram Jaccard near-dup: all pairs sharing at
    * least one shingle (the shingle equi-join bounds candidates), exact
    * Jaccard ≥ 0.5. No LSH approximation — this is the exhaustive-but-
    * indexed path; X2 is the sub-linear path.
    */
  def x4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(t(s, dir, "documents")).cache()
    val pairs = sh.as("s1")
      .join(sh.as("s2"),
        col("s1.shingle") === col("s2.shingle") && col("s1.doc_id") < col("s2.doc_id"))
      .select(col("s1.doc_id").as("doc_a"), col("s2.doc_id").as("doc_b"))
      .distinct()
    jaccardOfPairs(pairs, sh).filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_exact_dedup" -> (x1ExactDedup _),
    "x2_minhash_lsh" -> (x2MinhashLsh _),
    "x3_simhash" -> (x3Simhash _),
    "x4_ngram_jaccard" -> (x4NgramJaccard _))

  private val shingleSql =
    """sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
         WHERE len(ws) >= 3)"""

  private val jaccardSql =
    """sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       inter AS (
         SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
         FROM cand c
         JOIN sh s1 ON s1.doc_id = c.doc_a
         JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
         GROUP BY c.doc_a, c.doc_b),
       jac AS (
         SELECT i.doc_a, i.doc_b,
                CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) AS jaccard
         FROM inter i
         JOIN sizes na ON na.doc_id = i.doc_a
         JOIN sizes nb ON nb.doc_id = i.doc_b)"""

  val oracles: Map[String, String] = Map(
    "x1_exact_dedup" ->
      """SELECT MIN(doc_id) AS canonical_id, sha256(text) AS content_hash,
                COUNT(*) AS n_copies
         FROM documents GROUP BY sha256(text) ORDER BY canonical_id""",
    "x2_minhash_lsh" ->
      s"""WITH $shingleSql,
         hx AS (SELECT doc_id, shingle,
                  CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 1000000007 AS base
                FROM sh),
         mh AS (SELECT doc_id, k,
                  MIN((((k*2654435761 + 1) % 1000000007) * base
                       + (k*40503 + 17) % 1000000007) % 1000000007) AS m
                FROM hx CROSS JOIN (SELECT unnest(range(0, 24)) AS k)
                GROUP BY doc_id, k),
         bands AS (SELECT doc_id, k // 3 AS band,
                     SUM((m * (CASE k % 3 WHEN 0 THEN 1 WHEN 1 THEN 8191
                               ELSE 67092481 END)) % 1000000007) % 1000000007 AS bh
                   FROM mh GROUP BY doc_id, k // 3),
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         $jaccardSql
         SELECT doc_a, doc_b, jaccard FROM jac
         WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""",
    "x3_simhash" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         voted AS (
           SELECT doc_id, bit,
             CASE WHEN (CAST('0x' || substr(md5(tok), bit // 4 + 1, 1) AS BIGINT)
                        >> (bit % 4)) & 1 = 1 THEN 1 ELSE -1 END AS vote
           FROM toks CROSS JOIN (SELECT unnest(range(0, 64)) AS bit)),
         perbit AS (
           SELECT doc_id, bit,
                  CASE WHEN SUM(vote) > 0 THEN 1 ELSE 0 END AS onb
           FROM voted GROUP BY doc_id, bit)
         SELECT doc_id,
           SUM(CASE WHEN bit >= 32 THEN onb * (1::BIGINT << (bit - 32)) ELSE 0 END) AS simhash_hi,
           SUM(CASE WHEN bit < 32 THEN onb * (1::BIGINT << bit) ELSE 0 END) AS simhash_lo
         FROM perbit GROUP BY doc_id ORDER BY doc_id""",
    "x4_ngram_jaccard" ->
      s"""WITH $shingleSql,
         cand AS (SELECT DISTINCT s1.doc_id AS doc_a, s2.doc_id AS doc_b
                  FROM sh s1 JOIN sh s2
                    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id),
         $jaccardSql
         SELECT doc_a, doc_b, jaccard FROM jac
         WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""")
}
