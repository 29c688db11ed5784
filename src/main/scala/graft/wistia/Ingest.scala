package graft.wistia

import org.apache.spark.sql.SparkSession
import graft.sources.{RawZone, WistiaHttp}

/** The reference's ingestion entry point (`ingest_wistia.py:
  * run_wistia_ingestion`) as an engine lifecycle: fetch media metadata
  * (List endpoint, driver-side — the list is small) and per-media event
  * streams (via the wistia-raw connector's HTTP mode — one executor
  * partition per media), then land both in the raw zone under one run
  * stamp. Downstream, `Pipeline.runBatch`/`runIncremental` pick up from
  * the raw zone exactly as the reference's process scripts pick up the
  * ingestor's blobs.
  *
  * Failure isolation matches the reference: a media whose pagination
  * errors mid-way contributes the pages it yielded (connector
  * corruptPages metric counts the breaks); a failed media-list fetch
  * lands an empty media run rather than aborting events.
  */
object Ingest {

  /** One ingestion run. Returns the run stamp used for both entities. */
  def runIngestion(spark: SparkSession, apiBase: ApiEndpoints, token: String,
      mediaIdsForEvents: Seq[String], rawRoot: String,
      startDate: Option[String] = None, endDate: Option[String] = None,
      stamp: String = RawZone.runStamp()): String = {
    import spark.implicits._

    // media metadata: List endpoint with short-page pagination (driver)
    val mediaPages = WistiaHttp.mediaPages(apiBase.mediaListUrl, token, perPage = 100)
    val media = spark.read.schema(Schemas.rawMedia)
      .json(spark.createDataset(mediaPages.toSeq))
    RawZone.writeRun(media, rawRoot, "media", stamp)

    // events: distributed per-media pagination through the connector
    var reader = spark.read.format("wistia-raw")
      .schema(Schemas.rawEvent)
      .option("api.url", apiBase.eventsUrl)
      .option("api.token", token)
      .option("api.media_ids", mediaIdsForEvents.mkString(","))
    endDate.foreach(d => reader = reader.option("api.end_date", d))
    val events = startDate match {
      case Some(d) => reader.load().filter(
        org.apache.spark.sql.functions.col("received_at") >=
          org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf(s"$d 00:00:00")))
      case None => reader.load()
    }
    RawZone.writeRun(events, rawRoot, "events", stamp)
    stamp
  }
}

/** The two stats-API endpoints (reference EVENTS_LIST_URL /
  * MEDIA_LIST_URL constants).
  */
case class ApiEndpoints(eventsUrl: String, mediaListUrl: String)
