package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 stand-in for the reference's paginated REST event scan
  * (SURVEY S1–S3, `ingest_wistia.py:184-304`): the directory is the "API",
  * each `events_<media>_<page>.json` array file is one page response, and
  * the connector exposes exactly the API's own pushdown surface:
  *
  *  - partition-per-page ([[PageFile]]) — the page loop becomes
  *    parallel input partitions instead of a serial driver loop;
  *  - `media_id = 'x'` pushdown prunes page files before any IO
  *    (the reference pushes `media_id` as a query param, S2);
  *  - column pruning reaches the JSON parser (only required fields are
  *    materialized — `SupportsPushDownRequiredColumns`).
  *
  * Filters are reported pushed for pruning but still re-evaluated by
  * Spark (the parquet row-group contract); rows parse through Spark's
  * own JacksonParser so semantics match the file JSON source.
  *
  * Usage: `spark.read.format("wistia-raw").schema(Schemas.rawEvent)
  * .load(dir)`.
  */
class WistiaRawSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wistia-raw"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.wistia.Schemas.rawEvent

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WistiaRawTable(schema, properties.get("path"))
}

private[sources] class WistiaRawTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  require(path != null, "wistia-raw requires a path")
  override def name(): String = s"wistia-raw:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WistiaScanBuilder(schema, path)
}

private[sources] class WistiaScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // prune pages on media_id equality (the API's query param); report
    // those as pushed, hand everything back for re-evaluation.
    pushed = filters.collect { case f @ EqualTo("media_id", _: String) => f }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = WistiaScan(required, path,
    pushed.collectFirst { case EqualTo("media_id", v: String) => v })
}

private[sources] case class PageFile(file: String) extends InputPartition

private[sources] case class WistiaScan(required: StructType, path: String,
    mediaIdEq: Option[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"wistia-raw pages=$path pushedMediaId=${mediaIdEq.getOrElse("-")} " +
      s"readSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val pages = Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.startsWith("events_") &&
        f.getName.endsWith(".json"))
      .filter(f => mediaIdEq.forall(m => f.getName.startsWith(s"events_${m}_")))
      .sortBy(_.getName)
    pages.map(f => PageFile(f.getAbsolutePath): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WistiaReaderFactory(required)
}

private[sources] case class WistiaReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = partition.asInstanceOf[PageFile].file
      private lazy val rows: Iterator[InternalRow] = {
        val opts = new JSONOptions(Map.empty[String, String], "UTC")
        val parser = new JacksonParser(required, opts,
          allowArrayAsStructs = true, Seq.empty)
        val content = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
          java.nio.charset.StandardCharsets.UTF_8)
        parser.parse[String](content, CreateJacksonParser.string,
          UTF8String.fromString).iterator
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
