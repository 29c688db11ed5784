package graft.wistia

import org.apache.spark.sql.types._

/** Source-of-truth schemas for the Wistia-shaped data the reference
  * pipeline processes (SURVEY.md §1.3–1.4; field inventory verified over
  * reference raw_data/events_*.json and all_media_metadata_*.json —
  * reference: process_wistia_data_v2.py:40-84 declares the warehouse
  * side, cloud-run-job/media_stats_schema.json:1-110 the media side).
  *
  * Schema mode matches the reference: fixed-declared at sources and
  * sinks, never inferred (process_wistia_data_v2.py:568-572 loads with
  * autodetect=False). JSON reads should use PERMISSIVE mode to reproduce
  * the reference's `.get()` null-tolerance.
  */
object Schemas {

  val userAgentDetails: StructType = StructType(Seq(
    StructField("browser", StringType),
    StructField("browser_version", StringType),
    StructField("platform", StringType),
    StructField("mobile", BooleanType)))

  val thumbnail: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("fileSize", LongType),
    StructField("contentType", StringType),
    StructField("type", StringType)))

  /** Raw event record (Wistia stats/events.json). */
  val rawEvent: StructType = StructType(Seq(
    StructField("received_at", TimestampType),
    StructField("event_key", StringType),
    StructField("ip", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("org", StringType),
    StructField("email", StringType),
    StructField("percent_viewed", DoubleType), // fraction 0.0–1.0
    StructField("embed_url", StringType),
    StructField("conversion_type", StringType),
    StructField("conversion_data", MapType(StringType, StringType)),
    StructField("iframe_heatmap_url", StringType),
    StructField("visitor_key", StringType),
    StructField("user_agent_details", userAgentDetails),
    StructField("media_id", StringType),
    StructField("media_name", StringType),
    StructField("media_url", StringType),
    StructField("thumbnail", thumbnail),
    // the reference branches on an event-type `name` field that never
    // occurs in real payloads (SURVEY §1.3 "phantom field"); declared so
    // both with- and without-name inputs are processable.
    StructField("name", StringType)))

  val mediaProject: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("hashed_id", StringType)))

  val mediaAsset: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("fileSize", LongType),
    StructField("contentType", StringType),
    StructField("type", StringType)))

  /** Prod-variant raw event shape (process_wistia_data.py:314-330):
    * nested media/visitor structs, `occurred_at`, and a `type` field
    * taking 'play' / 'percent:0' … 'percent:100' — a DIFFERENT API shape
    * than [[rawEvent]] (FIXTURES.md A1 note).
    */
  val prodRawEvent: StructType = StructType(Seq(
    StructField("media", StructType(Seq(StructField("hashed_id", StringType)))),
    StructField("occurred_at", TimestampType),
    StructField("visitor", StructType(Seq(StructField("key", StringType)))),
    StructField("type", StringType),
    StructField("engagement", DoubleType)))

  /** Raw media metadata record (Wistia medias.json List endpoint). */
  val rawMedia: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("archived", BooleanType),
    StructField("created", TimestampType),
    StructField("updated", TimestampType),
    StructField("duration", DoubleType),
    StructField("hashed_id", StringType),
    StructField("description", StringType),
    StructField("progress", DoubleType),
    StructField("status", StringType),
    StructField("section", StringType),
    StructField("thumbnail", StructType(Seq(
      StructField("url", StringType),
      StructField("width", LongType),
      StructField("height", LongType)))),
    StructField("project", mediaProject),
    StructField("assets", ArrayType(mediaAsset))))

  /** dim_media output (process_wistia_data_v2.py:40-53). BIGNUMERIC →
    * DoubleType here (the prod variant itself uses FLOAT for the same
    * columns, process_wistia_data.py:248,266-267 — SURVEY §1.2).
    */
  val dimMedia: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("wistia_id", LongType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("created_at", TimestampType),
    StructField("duration", DoubleType),
    StructField("type", StringType),
    StructField("project_id", LongType),
    StructField("project_name", StringType),
    StructField("channel", StringType),
    StructField("updated_at", TimestampType),
    StructField("ingestion_timestamp", TimestampType, nullable = false)))

  /** dim_visitor output (process_wistia_data_v2.py:56-66). */
  val dimVisitor: StructType = StructType(Seq(
    StructField("visitor_id", StringType, nullable = false),
    StructField("ip_address", StringType),
    StructField("country", StringType),
    StructField("region", StringType),
    StructField("city", StringType),
    StructField("user_agent_browser", StringType),
    StructField("user_agent_platform", StringType),
    StructField("user_agent_mobile", BooleanType),
    StructField("ingestion_timestamp", TimestampType, nullable = false)))

  /** fact_media_engagement output (process_wistia_data_v2.py:69-84). */
  val factMediaEngagement: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("visitor_id", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("event_timestamp", TimestampType),
    StructField("percent_viewed", DoubleType),
    StructField("ip_address", StringType),
    StructField("country", StringType),
    StructField("play_count", LongType),
    StructField("play_rate", DoubleType),
    StructField("total_watch_time", DoubleType),
    StructField("ingestion_timestamp", TimestampType, nullable = false)))
}
