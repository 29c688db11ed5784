package graft.wistia

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Golden tests over the reference repo's own checked-in raw payloads
  * (/root/reference/raw_data — read-only fixtures; SURVEY §5 calls them
  * the de-facto golden inputs: 934 events across 11 run files, 96 media
  * records, 297 distinct (media, visitor, date) groups). Validates that
  * our declared schemas parse REAL Wistia payloads loss-free and that the
  * star-schema transforms reproduce the corpus-level facts recorded in
  * SURVEY §1.3/§6.
  */
class ReferenceFixturesSpec extends SparkSpec {

  private val raw = "/root/reference/raw_data"
  private def exists = new java.io.File(raw).isDirectory

  private def events = spark.read
    .schema(Schemas.rawEvent.add("_corrupt_record", "string"))
    .option("multiLine", "true") // reference raw files are JSON arrays
    .option("columnNameOfCorruptRecord", "_corrupt_record")
    .json(s"$raw/events_*.json")

  private def media = spark.read
    .schema(Schemas.rawMedia.add("_corrupt_record", "string"))
    .option("multiLine", "true")
    .option("columnNameOfCorruptRecord", "_corrupt_record")
    .json(s"$raw/all_media_metadata_20250512_114519.json")

  test("rawEvent schema parses all 934 real events loss-free") {
    assume(exists)
    val df = events.cache()
    assert(df.count() === 934)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(df.filter(col("received_at").isNull).count() === 0)
    // SURVEY §1.3: percent_viewed is a 0–1 fraction in real data
    val mm = df.agg(min("percent_viewed"), max("percent_viewed")).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
    // SURVEY §1.3: the `name` (event-type) field never occurs in real events
    assert(df.filter(col("name").isNotNull).count() === 0)
    assert(df.select("media_id").distinct().count() === 2)
  }

  test("rawMedia schema parses all 96 real media records loss-free") {
    assume(exists)
    val df = media.cache()
    assert(df.count() === 96)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(df.filter(col("hashed_id").isNull).count() === 0)
    // nested projections used by P1 resolve on real payloads
    assert(df.filter(col("project.id").isNull).count() === 0)
    assert(df.filter(col("duration").isNull).count() === 0)
  }

  test("star-schema transforms reproduce corpus-level facts on real data") {
    assume(exists)
    val ts0 = Timestamp.valueOf("2025-05-12 11:45:19")
    val targets = Seq("gskhw4w4lm", "v08dlrgr7v")

    val dimMedia = Transforms.dimMedia(media, targets, ts0).cache()
    assert(dimMedia.count() === 2)

    val dimVisitor = Transforms.dimVisitor(events, ts0)
    assert(dimVisitor.count() === 297) // SURVEY §6: 297 distinct visitors

    val fact = Transforms.factMediaEngagement(
      events, dimMedia.select(col("media_id"), col("duration")), ts0).cache()
    assert(fact.count() === 297) // SURVEY §6: 297 (media, visitor, date) groups

    // A6/A7 invariants on real data: watch-time within [0, duration],
    // play_rate within [0, 1], play_count fallback keeps counts sane
    val dur = dimMedia.select(col("media_id"), col("duration").as("dur"))
    val bad = fact.join(dur, "media_id").filter(
      col("total_watch_time") < 0 || col("total_watch_time") > col("dur") ||
        col("play_rate") < 0 || col("play_rate") > 1 || col("play_count") < 0)
    assert(bad.count() === 0)

    // effective A2 semantics (no `name` field): play_count is 0/1
    assert(fact.filter(!col("play_count").isin(0L, 1L)).count() === 0)
  }
}
