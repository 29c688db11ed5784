package graft.wistia

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Star-schema transforms of the reference pipeline, re-expressed as
  * declarative DataFrame plans (SURVEY §2/§3; reference:
  * process_wistia_data_v2.py:240-530 and process_wistia_data.py:241-361).
  *
  * Scale: dims are tiny (broadcast side); the fact build is one shuffle
  * on (media_id, visitor_key, date) shared by the window sort and the
  * group-by; duration enrichment is a broadcast join (the reference's
  * dict lookup, J1). Fact output should be written partitioned by `date`
  * — exactly what the reference's own schema comments recommend
  * (process_wistia_data_v2.py:81-83).
  */
object Transforms {

  /** P3 — channel classifier (process_wistia_data_v2.py:274-278):
    * case-sensitive substring match on the title; empty/null title → null.
    */
  def channel(title: Column): Column =
    when(title.isNotNull && title =!= "" &&
      (title.contains("Facebook") || title.contains("FB")), "Facebook")
      .when(title.isNotNull && title =!= "" &&
        (title.contains("Youtube") || title.contains("YT")), "YouTube")
      .otherwise(lit(null).cast("string"))

  /** dim_media — F1 IN-list filter + P1 projection/renames
    * (process_wistia_data_v2.py:263-310). `ingestionTs` stands in for the
    * reference's per-run processing timestamp.
    */
  def dimMedia(rawMedia: DataFrame, targetHashedIds: Seq[String],
      ingestionTs: java.sql.Timestamp): DataFrame =
    rawMedia
      .filter(col("hashed_id").isin(targetHashedIds: _*))
      .select(
        col("hashed_id").as("media_id"),
        col("id").as("wistia_id"),
        coalesce(col("name"), lit("")).as("title"),
        lit(null).cast("string").as("url"), // reference :301 emits None
        col("created").as("created_at"),
        col("duration"),
        col("type"),
        col("project.id").as("project_id"),
        col("project.name").as("project_name"),
        channel(coalesce(col("name"), lit(""))).as("channel"),
        col("updated").as("updated_at"),
        lit(ingestionTs).as("ingestion_timestamp"))

  /** The v1 ingestor's Show-endpoint metadata projection
    * (`ingest_wistia_v1.py:188-194` extracted_metadata): {id, hashed_id,
    * title ← name, created_at ← created} over a raw media frame (landed
    * by `Ingest.runIngestion(mediaMode = "show")` — the Show body is the
    * same media JSON shape as a List item).
    */
  def mediaMetadataV1(rawMedia: DataFrame): DataFrame =
    rawMedia.select(
      col("id"),
      col("hashed_id"),
      col("name").as("title"),
      col("created").as("created_at"))

  /** dim_visitor — A10 first-occurrence dedup + P2 user-agent flatten
    * (process_wistia_data_v2.py:314-344). The reference keeps the first
    * occurrence in *file order*; distributed reads have no file order, so
    * the caller supplies a deterministic ordering column (default:
    * received_at, tie-broken by event_key) — documented divergence.
    */
  def dimVisitor(rawEvents: DataFrame, ingestionTs: java.sql.Timestamp,
      order: Seq[Column] = Seq(col("received_at"), col("event_key"))): DataFrame = {
    val w = Window.partitionBy(col("visitor_key")).orderBy(order: _*)
    rawEvents
      .filter(col("visitor_key").isNotNull && col("visitor_key") =!= "")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("visitor_key").as("visitor_id"),
        col("ip").as("ip_address"),
        col("country"),
        col("region"),
        col("city"),
        col("user_agent_details.browser").as("user_agent_browser"),
        col("user_agent_details.platform").as("user_agent_platform"),
        col("user_agent_details.mobile").as("user_agent_mobile"),
        lit(ingestionTs).as("ingestion_timestamp"))
  }

  /** fact_media_engagement — the full v2 aggregation (A1–A7;
    * process_wistia_data_v2.py:348-530) as one declarative plan:
    *
    *  - group key (media_id, visitor_key, date(received_at)), dropping
    *    rows missing any key part (F2, :374-387)
    *  - play_count: count of name=='play', else 1 if any percent>0 (A2)
    *  - percent_viewed: max, null-skipped, default 0.0 (A3)
    *  - event_timestamp: first event in time order (A4; min is
    *    equivalent under time ordering)
    *  - ip_address/country: first non-null in time order (A5; the
    *    reference's overwrite-until-both-found loop degenerates to this
    *    whenever events carry both fields, which real payloads do)
    *  - total_watch_time: A6 via [[WatchTime.windowed]] (faithful /100
    *    quirk by default)
    *  - play_rate: round2(watch/duration) with zero-guards (A7)
    *  - play_count==0 forces watch=0, rate=0 (:477-481)
    *
    * `durations` = dim_media (media_id, duration), broadcast (J1).
    */
  def factMediaEngagement(rawEvents: DataFrame, durations: DataFrame,
      ingestionTs: java.sql.Timestamp,
      scaleDivisor: Double = WatchTime.percentScaleDivisor): DataFrame = {
    val events = rawEvents
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .join(broadcast(durations.select(col("media_id"), col("duration"))),
        Seq("media_id"), "left")

    val wTime = Window
      .partitionBy(col("media_id"), col("visitor_key"), to_date(col("received_at")))
      .orderBy(col("received_at"), col("event_key"))

    val grouped = events
      .withColumn("rn", row_number().over(wTime))
      .withColumn("first_ip",
        first(when(col("ip").isNotNull && col("ip") =!= "", col("ip")), ignoreNulls = true)
          .over(wTime.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("first_country",
        first(when(col("country").isNotNull && col("country") =!= "", col("country")),
          ignoreNulls = true)
          .over(wTime.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy(
        col("media_id"), col("visitor_key").as("visitor_id"),
        to_date(col("received_at")).as("date"))
      .agg(
        min(col("received_at")).as("event_timestamp"),
        coalesce(max(col("percent_viewed")), lit(0.0)).as("percent_viewed"),
        first(col("first_ip")).as("ip_address"),
        first(col("first_country")).as("country"),
        sum(when(col("name") === "play", 1L).otherwise(0L)).as("n_play"),
        max(when(coalesce(col("percent_viewed"), lit(0.0)) > 0, 1L).otherwise(0L))
          .as("any_progress"),
        max(col("duration")).as("duration"))
      .withColumn("play_count",
        when(col("n_play") === 0L && col("any_progress") === 1L, 1L).otherwise(col("n_play")))

    val watch = WatchTime.windowed(
      events.select(col("media_id"), col("visitor_key"), col("received_at"),
        col("event_key"), col("percent_viewed"), col("name"), col("duration")), scaleDivisor)

    grouped
      .join(watch, Seq("media_id", "visitor_id", "date"), "left")
      .withColumn("total_watch_time",
        when(col("play_count") === 0L, 0.0) // :477-481 zero-guard
          .otherwise(coalesce(col("total_watch_time"), lit(0.0))))
      .withColumn("play_rate",
        when(col("play_count") === 0L, 0.0)
          .when(col("duration").isNotNull && col("duration") > 0 && col("total_watch_time") > 0,
            bround(col("total_watch_time") / col("duration"), 2))
          .otherwise(0.0))
      .select(
        col("media_id"), col("visitor_id"), col("date"),
        col("event_timestamp"), col("percent_viewed"),
        col("ip_address"), col("country"),
        col("play_count"), col("play_rate"), col("total_watch_time"),
        lit(ingestionTs).as("ingestion_timestamp"))
  }

  /** Prod-variant per-event fact (A9; process_wistia_data.py:295-361):
    * pure projection, one output row per event, no grouping.
    */
  def perEventFact(rawEvents: DataFrame, durations: DataFrame,
      ingestionTs: java.sql.Timestamp): DataFrame =
    rawEvents
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .join(broadcast(durations.select(col("media_id"), col("duration"))),
        Seq("media_id"), "left")
      .select(
        col("media_id"),
        col("visitor_key").as("visitor_id"),
        to_date(col("received_at")).as("date"),
        col("received_at").as("event_timestamp"),
        col("percent_viewed"),
        col("ip").as("ip_address"),
        col("country"),
        when(col("name") === "play", 1L).otherwise(lit(null).cast("long")).as("play_count"),
        lit(null).cast("double").as("play_rate"),
        when(col("name") === "percent:100", col("duration"))
          .otherwise(lit(null).cast("double")).as("total_watch_time"),
        lit(ingestionTs).as("ingestion_timestamp"))

  /** Literal A9 on the prod-variant raw shape ([[Schemas.prodRawEvent]];
    * process_wistia_data.py:295-361): one output row per event with a
    * valid timestamp AND media id (visitor may be null — the reference
    * keeps such rows), `play_count = 1` only for type='play' else null,
    * `total_watch_time = duration` only for type='percent:100' with a
    * known duration, `play_rate` always null. Output column names match
    * the reference's fact dict exactly.
    */
  def prodEventFact(prodEvents: DataFrame, durations: DataFrame): DataFrame =
    prodEvents
      .select(
        col("media.hashed_id").as("media_hashed_id"),
        col("occurred_at"),
        col("visitor.key").as("visitor_id"),
        col("type"))
      .filter(col("occurred_at").isNotNull && col("media_hashed_id").isNotNull)
      .join(broadcast(durations.select(
        col("media_id").as("media_hashed_id"), col("duration"))),
        Seq("media_hashed_id"), "left")
      .select(
        col("media_hashed_id"),
        col("occurred_at").as("event_timestamp"),
        col("visitor_id"),
        when(col("type") === "play", 1L).otherwise(lit(null).cast("long"))
          .as("play_count"),
        lit(null).cast("double").as("play_rate"),
        when(col("type") === "percent:100", col("duration"))
          .otherwise(lit(null).cast("double")).as("total_watch_time"))

  /** A8/T1 — high-water mark: max non-null event_timestamp of the fact
    * table; None on empty (caller falls back to the historical start,
    * reference :614-619).
    */
  def highWaterMark(fact: DataFrame): Option[java.sql.Timestamp] = {
    val r = fact.filter(col("event_timestamp").isNotNull)
      .agg(max(col("event_timestamp"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getTimestamp(0))
  }

  /** T2 — incremental source filter: strictly-after hwm+1s (the
    * reference pushes `since = hwm + 1s` to its source,
    * process_wistia_data.py:408-423).
    */
  def incrementalSince(rawEvents: DataFrame, hwm: java.sql.Timestamp): DataFrame =
    rawEvents.filter(
      col("received_at") >= lit(new java.sql.Timestamp(hwm.getTime + 1000L)))
}
