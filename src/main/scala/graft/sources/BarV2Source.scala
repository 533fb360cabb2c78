package graft.sources

import java.net.{URLEncoder => UEnc}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions.{col, concat_ws, first}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{BarSource, HttpTransport, JdkHttpTransport}

/** Distributed live OHLCV ingest as a DataSourceV2 `TableProvider` — the
  * scale-out upgrade of [[graft.etl.HttpBarSource]]'s driver-side fetch.
  *
  * The reference downloads its whole watchlist in ONE vendor call
  * (`/root/reference/src/data_collection/yf_collector.py:50-59`), which is
  * right for 10 tickers and a bottleneck for 10 000: a single driver
  * fetches, parses, and ships every bar. Here the watchlist is split into
  * ticker BATCHES, one `InputPartition` each, and every Spark task issues
  * its own vendor request (same `GET {base}/bars?tickers=...` CSV contract)
  * and parses it executor-side — live ingest throughput scales with the
  * cluster, and a 10k-ticker watchlist becomes 10k/batchSize concurrent
  * bounded fetches instead of one giant frame on the driver.
  *
  * Output is the LONG bar shape `(ts, ticker, field, value)` — schema fixed
  * and known up front (a wide per-ticker schema would vary with the
  * watchlist, defeating schema inference and column pruning). The wide
  * seam for existing consumers is [[V2BarSource]], which pivots the
  * (bounded: watchlist × period) result back to `<ticker>:<field>` columns.
  *
  * Per-partition semantics mirror the reference collector:
  *  - expected-column validation runs PER PARTITION on the fetched header
  *    (≙ `yf_collector.py:74-92`): missing fields for a requested ticker
  *    are logged and tolerated (nulls downstream), a batch with no
  *    requested-ticker columns at all hard-fails the task
  *    (≙ `yf_collector.py:61-65` empty-data);
  *  - transient transport failures retry up to `maxAttempts` inside the
  *    task before the task itself fails (then Spark's own task retry takes
  *    over — vendor flakiness is survived twice);
  *  - the [[HttpTransport]] seam is preserved: tests register scripted
  *    transports in [[TransportRegistry]] and select them by option.
  */
class BarDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BarV2.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BarTable(properties.asScala.toMap)
}

object BarV2 {
  /** Fixed long schema: one row per (bar timestamp, ticker, OHLCV field). */
  val Schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("ticker", StringType, nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  /** Split `tickers` into fetch batches of at most `batchSize`, preserving
    * order — each batch is one `InputPartition` = one vendor request.
    */
  def batches(tickers: Seq[String], batchSize: Int): Seq[Seq[String]] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    tickers.grouped(batchSize).toSeq
  }
}

/** Executor-resolvable transport lookup: V2 readers run on executors, so a
  * transport instance can't ride the options map. Named SERIALIZABLE-FREE
  * resolution instead: "jdk" (the default) resolves statically everywhere;
  * tests register scripted instances under other names. Registration is
  * JVM-local — on a multi-node cluster only statically resolvable names
  * ("jdk") are meaningful, which is exactly the production case; scripted
  * names are a local-mode test seam.
  */
object TransportRegistry {
  private val named = new ConcurrentHashMap[String, HttpTransport]()

  def register(name: String, t: HttpTransport): Unit = named.put(name, t)
  def unregister(name: String): Unit = named.remove(name)

  def resolve(name: String): HttpTransport =
    if (name == "jdk") JdkHttpTransport
    else {
      val t = named.get(name)
      require(t != null, s"no transport registered under '$name' in this JVM")
      t
    }
}

private[sources] final class BarTable(props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    s"bars(${props.getOrElse("baseurl", "?")})"

  override def schema(): StructType = BarV2.Schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // table properties (load-time options) and scan options are the same
    // map in the DataFrame reader path; prefer the scan's view
    val all = props ++ options.asScala
    new ScanBuilder {
      override def build(): Scan = new BarScan(BarScanConfig(all))
    }
  }
}

/** Parsed, validated option set — one place for the option contract. */
private[sources] final case class BarScanConfig(
    baseUrl: String,
    tickers: Seq[String],
    period: String,
    interval: String,
    batchSize: Int,
    timeoutMillis: Int,
    maxAttempts: Int,
    transportName: String)

private[sources] object BarScanConfig {
  def apply(o: Map[String, String]): BarScanConfig = {
    val tickers = o.getOrElse("tickers",
      throw new IllegalArgumentException("option 'tickers' is required"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(tickers.nonEmpty, "tickers list is empty (yf_collector.py:42-44)")
    BarScanConfig(
      baseUrl = o.getOrElse("baseurl",
        throw new IllegalArgumentException("option 'baseUrl' is required")),
      tickers = tickers,
      period = o.getOrElse("period", "7d"),
      interval = o.getOrElse("interval", "60m"),
      batchSize = o.getOrElse("batchsize", "50").toInt,
      timeoutMillis = o.getOrElse("timeoutmillis", "15000").toInt,
      maxAttempts = o.getOrElse("maxattempts", "3").toInt,
      transportName = o.getOrElse("transport", "jdk"))
  }
}

private[sources] final class BarScan(cfg: BarScanConfig) extends Scan with Batch {
  override def readSchema(): StructType = BarV2.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    BarV2.batches(cfg.tickers, cfg.batchSize)
      .map(b => BarBatchPartition(b): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new BarReaderFactory(cfg)
}

/** One vendor request's worth of tickers. */
private[sources] final case class BarBatchPartition(tickers: Seq[String])
    extends InputPartition

private[sources] final class BarReaderFactory(cfg: BarScanConfig)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BarPartitionReader(cfg, p.asInstanceOf[BarBatchPartition].tickers)
}

/** Executor-side reader: fetch this partition's ticker batch (with bounded
  * retry), validate the header against the requested tickers, stream long
  * rows. The whole response is one bounded CSV (batch × period bars), so
  * parsing it eagerly on first `next()` is the memory profile the driver
  * path already had — per BATCH now, not per watchlist.
  */
private[sources] final class BarPartitionReader(
    cfg: BarScanConfig, tickers: Seq[String])
    extends PartitionReader[InternalRow] with Logging {

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def enc(s: String) = UEnc.encode(s, StandardCharsets.UTF_8)

  private def fetchBody(): String = {
    val transport = TransportRegistry.resolve(cfg.transportName)
    val url = s"${cfg.baseUrl}/bars?tickers=${enc(tickers.mkString(","))}" +
      s"&period=${enc(cfg.period)}&interval=${enc(cfg.interval)}"
    var left = cfg.maxAttempts
    while (true) {
      try return transport.get(url, cfg.timeoutMillis)
      catch {
        case NonFatal(e) =>
          left -= 1
          if (left <= 0) throw e
          logWarning(s"bar fetch retry (${cfg.maxAttempts - left}/${cfg.maxAttempts}) " +
            s"for batch ${tickers.mkString(",")}: ${e.getMessage}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def parse(): Iterator[InternalRow] = {
    val lines = fetchBody().split("\n").iterator
      .map(_.stripLineEnd).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, "bar endpoint returned an empty body")
    val header = lines.head.split(",", -1).toSeq
    require(header.headOption.contains("ts"),
      s"bar CSV must lead with a ts column, got: ${header.take(3).mkString(",")}")
    // keep only THIS partition's requested tickers — a vendor returning
    // extra columns must not leak other tickers into this partition's rows
    val wanted: IndexedSeq[(Int, UTF8String, UTF8String)] =
      header.zipWithIndex.drop(1).collect {
        case (c, i) if c.contains(":") && tickers.contains(c.split(":")(0)) =>
          val Array(t, f) = c.split(":", 2)
          (i, UTF8String.fromString(t), UTF8String.fromString(f))
      }.toIndexedSeq
    // empty-data hard fail ≙ yf_collector.py:61-65
    require(wanted.nonEmpty,
      s"fetch returned no <ticker>:<field> columns for any requested ticker " +
        s"of ${tickers.mkString(",")} (yf_collector.py:61-65 empty-data)")
    // expected-column validation ≙ yf_collector.py:74-92 — warn and proceed
    val present = wanted.map { case (_, t, f) => (t.toString, f.toString) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    tickers.foreach { t =>
      val missing = graft.etl.BarIngest.ExpectedFields -- present.getOrElse(t, Set.empty)
      if (missing.nonEmpty)
        logWarning(s"ticker $t missing expected fields ${missing.mkString(",")} " +
          "(yf_collector.py:74-92 — tolerated as nulls)")
    }
    lines.tail.iterator.flatMap { line =>
      val cells = line.split(",", -1)
      require(cells.length == header.length,
        s"bar CSV row has ${cells.length} cells, header has ${header.length}")
      val micros = DateTimeUtils.instantToMicros(graft.etl.BarCsv.parseInstant(cells(0)))
      wanted.iterator.map { case (i, t, f) =>
        val row = new GenericInternalRow(4)
        row.setLong(0, micros)
        row.update(1, t)
        row.update(2, f)
        val cell = cells(i)
        val v = if (cell.isEmpty) null
          else try java.lang.Double.valueOf(cell.toDouble)
            catch { case _: NumberFormatException => null }
        if (v == null) row.setNullAt(3) else row.setDouble(3, v.doubleValue())
        row: InternalRow
      }
    }
  }

  override def next(): Boolean = {
    if (rows == null) rows = parse()
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** [[BarSource]] adapter over the V2 provider, so every existing consumer
  * (BarIngest → Standardizer → pipeline) runs the DISTRIBUTED fetch path
  * unchanged: load the long table, pivot back to the wide
  * `<ticker>:<field>` seam (bounded: watchlist × fields columns,
  * watchlist × period rows — the same frame the reference holds in
  * pandas). Production consumers wanting the raw long shape read the V2
  * table directly.
  */
final class V2BarSource(
    baseUrl: String,
    transportName: String = "jdk",
    batchSize: Int = 50,
    timeoutMillis: Int = 15000,
    maxAttempts: Int = 3) extends BarSource {

  def fetchWide(
      spark: org.apache.spark.sql.SparkSession,
      tickers: Seq[String],
      period: String,
      interval: String): DataFrame = {
    val long = spark.read
      .format(classOf[BarDataSource].getName)
      .option("baseUrl", baseUrl)
      .option("tickers", tickers.mkString(","))
      .option("period", period)
      .option("interval", interval)
      .option("batchSize", batchSize.toString)
      .option("timeoutMillis", timeoutMillis.toString)
      .option("maxAttempts", maxAttempts.toString)
      .option("transport", transportName)
      .load()
    // explicit pivot values (tickers × observed fields is still dynamic, so
    // one bounded distinct job discovers the columns; the alternative —
    // pivot() with no values — runs the same job implicitly)
    val cols = long.select(concat_ws(":", col("ticker"), col("field")).as("c"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    long
      .groupBy(col("ts"))
      .pivot(concat_ws(":", col("ticker"), col("field")), cols)
      .agg(first(col("value")))
  }
}
