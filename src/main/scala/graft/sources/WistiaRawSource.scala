package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 stand-in for the reference's paginated REST event scan
  * (SURVEY S1–S3, `ingest_wistia.py:184-304`): the directory is the "API",
  * each `events_<media>_<yyyyMMdd>_<HHmmss>.json` array file is one page
  * response, and the connector exposes exactly the API's own pushdown
  * surface:
  *
  *  - partition-per-page ([[PageFile]]) — the page loop becomes
  *    parallel input partitions instead of a serial driver loop;
  *  - `media_id = 'x'` pushdown prunes page files before any IO
  *    (the reference pushes `media_id` as a query param, S2);
  *  - `received_at > t` / `>= t` pushdown prunes pages by their run
  *    stamp (the reference pushes `since`/date ranges to the API,
  *    `ingest_wistia.py:259-265`). Soundness contract: a page only
  *    contains events received before its fetch wall-clock, so a page
  *    stamped more than [[WistiaScan.StampSkewMicros]] (24 h of
  *    clock/timezone slack — the reference stamps local time while
  *    received_at is UTC) before the bound cannot match;
  *  - column pruning reaches the JSON parser (only required fields are
  *    materialized — `SupportsPushDownRequiredColumns`).
  *
  * Filters are reported pushed for pruning but still re-evaluated by
  * Spark (the parquet row-group contract), so pruning is a pure IO
  * optimization — results never change. Listing and reads go through the
  * Hadoop FileSystem API: any fs scheme Spark can reach (file://, s3a://,
  * gs://, hdfs://) works, not just the local disk.
  *
  * Usage: `spark.read.format("wistia-raw").schema(Schemas.rawEvent)
  * .load(dir)`.
  */
class WistiaRawSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "wistia-raw"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.wistia.Schemas.rawEvent

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WistiaRawTable(schema, ApiConf.from(properties))
}

/** Connector target: either a page-file directory (`path`) or a live
  * stats API (`api.url` + optional `api.token`, `api.media_ids`
  * comma-list, `api.per_page`, `api.end_date`) — the reference's
  * `ingest_wistia.py` HTTP boundary (S1–S3 live).
  */
private[sources] case class ApiConf(path: String, apiUrl: String, token: String,
    mediaIds: Seq[String], perPage: Int, endDate: Option[String],
    maxAttempts: Int = 1) {
  def isHttp: Boolean = apiUrl.nonEmpty
}

private[sources] object ApiConf {
  def from(p: util.Map[String, String]): ApiConf = ApiConf(
    path = p.getOrDefault("path", ""),
    apiUrl = p.getOrDefault("api.url", ""),
    token = p.getOrDefault("api.token", ""),
    mediaIds = Option(p.get("api.media_ids")).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
    perPage = p.getOrDefault("api.per_page", "100").toInt,
    endDate = Option(p.get("api.end_date")),
    // 1 = the reference's stop-and-move-on (no retry); >1 opts into
    // WistiaHttp.getRetrying's bounded backoff for fleet-scale reads
    maxAttempts = p.getOrDefault("api.max_attempts", "1").toInt)
}

private[sources] class WistiaRawTable(schema: StructType, conf: ApiConf)
    extends Table with SupportsRead {
  require(conf.path.nonEmpty || conf.isHttp,
    "wistia-raw requires a path or api.url")
  override def name(): String =
    if (conf.isHttp) s"wistia-raw:${conf.apiUrl}" else s"wistia-raw:${conf.path}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WistiaScanBuilder(schema, conf)
}

private[sources] class WistiaScanBuilder(fullSchema: StructType, conf: ApiConf)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  private def toMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime * 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // prune pages on media_id equality (the API's query param) and on
    // received_at lower bounds (the API's `since`); report those as
    // pushed, hand everything back for re-evaluation.
    pushed = filters.collect {
      case f @ EqualTo("media_id", _: String) => f
      case f @ GreaterThan("received_at", v) if toMicros(v).isDefined => f
      case f @ GreaterThanOrEqual("received_at", v) if toMicros(v).isDefined => f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val sinceMicros = pushed.flatMap {
      case GreaterThan("received_at", v) => toMicros(v)
      case GreaterThanOrEqual("received_at", v) => toMicros(v)
      case _ => None
    }.maxOption
    val mediaIdEq = pushed.collectFirst { case EqualTo("media_id", v: String) => v }
    if (conf.isHttp) WistiaHttpScan(required, conf, mediaIdEq, sinceMicros)
    else WistiaScan(required, conf.path, mediaIdEq, sinceMicros)
  }
}

private[sources] case class PageFile(file: String) extends InputPartition

private[sources] case class WistiaScan(required: StructType, path: String,
    mediaIdEq: Option[String], sinceMicros: Option[Long]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"wistia-raw pages=$path pushedMediaId=${mediaIdEq.getOrElse("-")} " +
      s"pushedSinceMicros=${sinceMicros.getOrElse("-")} " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    val pages = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("events_") &&
        st.getPath.getName.endsWith(".json"))
      .filter(st => mediaIdEq.forall(m => st.getPath.getName.startsWith(s"events_${m}_")))
      .filter(st => sinceMicros.forall(since =>
        WistiaScan.stampMicros(st.getPath.getName).forall(
          _ + WistiaScan.StampSkewMicros > since)))
      .sortBy(_.getPath.getName)
    pages.map(st => PageFile(st.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WistiaReaderFactory(required, new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf()))

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new CorruptPagesMetric)
}

/** Count of page files that failed to parse/read and were isolated
  * instead of failing the scan (reference per-media failure isolation,
  * process_wistia_data.py:446-477). Shows up in the SQL UI per scan.
  */
private[sources] class CorruptPagesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "corruptPages"
  override def description(): String = "corrupt page files isolated"
}

private[sources] object WistiaScan {
  /** Clock/timezone slack before a page can be stamp-pruned (see class
    * doc — reference run stamps are fetcher-local wall-clock).
    */
  val StampSkewMicros: Long = 24L * 3600 * 1000000

  /** Run stamp of `events_<media>_<yyyyMMdd>_<HHmmss>.json` as epoch
    * micros (stamp read as UTC); None when the name doesn't carry one
    * (such pages are never pruned).
    */
  def stampMicros(name: String): Option[Long] = {
    val parts = name.stripSuffix(".json").split('_')
    if (parts.length < 3) None
    else try {
      val dt = java.time.LocalDateTime.parse(
        s"${parts(parts.length - 2)}${parts(parts.length - 1)}",
        java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      Some(dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
    } catch { case _: java.time.format.DateTimeParseException => None }
  }
}

private[sources] case class MediaPartition(mediaId: String) extends InputPartition

/** Live-API scan (S1–S3 at the HTTP boundary): one input partition per
  * media id — the reference's serial per-media loop
  * (`run_wistia_ingestion`) becomes parallel executor work, while each
  * media's page walk stays serial (the API's own pagination contract).
  * Pushdown surface matches the API's query params: `media_id = x`
  * restricts the partition list; a `received_at` lower bound becomes the
  * `start_date` param (date-granular — rows are still exactly
  * re-filtered by Spark). Per-media failure isolation is the protocol
  * itself: an error mid-pagination ends that media's iterator with the
  * pages already fetched (reference :286-300), counted via the
  * corruptPages metric.
  */
private[sources] case class WistiaHttpScan(required: StructType, conf: ApiConf,
    mediaIdEq: Option[String], sinceMicros: Option[Long]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"wistia-raw api=${conf.apiUrl} pushedMediaId=${mediaIdEq.getOrElse("-")} " +
      s"pushedSinceMicros=${sinceMicros.getOrElse("-")} " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  private def startDate: Option[String] = sinceMicros.map { us =>
    java.time.Instant.ofEpochSecond(us / 1000000L)
      .atOffset(java.time.ZoneOffset.UTC).toLocalDate.toString
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val medias = mediaIdEq match {
      case Some(m) if conf.mediaIds.isEmpty || conf.mediaIds.contains(m) => Seq(m)
      case Some(_) => Seq.empty
      case None => conf.mediaIds
    }
    require(medias.nonEmpty || mediaIdEq.nonEmpty,
      "wistia-raw http mode needs api.media_ids or a media_id = '…' filter")
    medias.map(m => MediaPartition(m): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WistiaHttpReaderFactory(required, conf, startDate)

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new CorruptPagesMetric)
}

private[sources] case class WistiaHttpReaderFactory(required: StructType,
    conf: ApiConf, startDate: Option[String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val media = partition.asInstanceOf[MediaPartition].mediaId
      private var corrupt = 0L
      private val opts = new JSONOptions(Map.empty[String, String], "UTC")
      private val parser = new JacksonParser(required, opts,
        allowArrayAsStructs = true, Seq.empty)
      private var pages: Iterator[String] = WistiaHttp.eventPages(
        conf.apiUrl, conf.token, media, conf.perPage, startDate, conf.endDate,
        conf.maxAttempts)
      private var rows: Iterator[InternalRow] = Iterator.empty
      private var current: InternalRow = _

      @annotation.tailrec
      private def advance(): Boolean =
        if (rows.hasNext) { current = rows.next(); true }
        else if (!pages.hasNext) false
        else {
          rows = try {
            parser.parse[String](pages.next(), CreateJacksonParser.string,
              UTF8String.fromString).toVector.iterator
          } catch {
            case e: Throwable => // unparseable page: isolate, stop this media
              corrupt += 1L
              System.err.println(
                s"[wistia-raw] corrupt API page for $media: ${e.toString.take(200)}")
              pages = Iterator.empty // reference stops pagination on decode error
              Iterator.empty
          }
          advance()
        }

      override def next(): Boolean = advance()
      override def get(): InternalRow = current
      override def close(): Unit = ()

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
          override def name(): String = "corruptPages"
          override def value(): Long = corrupt
        })
    }
}

private[sources] case class WistiaReaderFactory(required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = partition.asInstanceOf[PageFile].file
      private var corrupt = 0L
      // Per-page failure isolation (reference process_wistia_data.py:
      // 446-477 isolates fetch failure per media): an unreadable or
      // unparseable page file becomes one `_corrupt_record` row (when the
      // schema carries that column — matching PERMISSIVE multiline JSON
      // semantics) or is skipped, counted in the corruptPages metric —
      // never a failed scan.
      private lazy val rows: Iterator[InternalRow] = {
        try {
          val opts = new JSONOptions(Map.empty[String, String], "UTC")
          val parser = new JacksonParser(required, opts,
            allowArrayAsStructs = true, Seq.empty)
          val p = new Path(file)
          // driver-captured Hadoop conf (object-store credentials included)
          val in = p.getFileSystem(conf.value).open(p)
          val content = try {
            new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
              java.nio.charset.StandardCharsets.UTF_8)
          } finally in.close()
          // materialize now: Jackson throws lazily per record otherwise
          parser.parse[String](content, CreateJacksonParser.string,
            UTF8String.fromString).toVector.iterator
        } catch {
          case e: Throwable =>
            corrupt = 1L
            val ci = required.fieldNames.indexOf("_corrupt_record")
            if (ci < 0) {
              System.err.println(s"[wistia-raw] skipping corrupt page $file: " +
                e.toString.take(200))
              Iterator.empty
            } else {
              val row = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(required.length)
              row.update(ci, UTF8String.fromString(
                s"$file: ${e.toString.take(500)}"))
              Iterator.single(row)
            }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()

      override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
          override def name(): String = "corruptPages"
          override def value(): Long = corrupt
        })
    }
}
