package graft.wistia

import graft.SparkSpec

class ProdEventFactSpec extends SparkSpec {
  test("literal A9 on the prod raw shape (FIXTURES A1 prod-variant note)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val raw = Seq(
      """{"media": {"hashed_id": "abc"}, "occurred_at": "2024-03-01T10:00:00Z",
        | "visitor": {"key": "v1"}, "type": "play"}""",
      """{"media": {"hashed_id": "abc"}, "occurred_at": "2024-03-01T10:01:00Z",
        | "visitor": {"key": "v1"}, "type": "percent:100"}""",
      """{"media": {"hashed_id": "abc"}, "occurred_at": "2024-03-01T10:02:00Z",
        | "type": "percent:50"}""",
      """{"media": {"hashed_id": "zzz"}, "occurred_at": "2024-03-01T10:03:00Z",
        | "visitor": {"key": "v2"}, "type": "percent:100"}""",
      """{"media": {"hashed_id": "abc"}, "visitor": {"key": "v3"}, "type": "play"}""")
      .map(_.stripMargin.replace("\n", ""))
    val events = spark.read.schema(Schemas.prodRawEvent).json(raw.toDS)
    val durations = Seq(("abc", 90.0)).toDF("media_id", "duration")
    val out = Transforms.prodEventFact(events, durations)
      .orderBy("event_timestamp").collect()

    assert(out.length === 4) // missing-timestamp row dropped, null-visitor kept
    assert(out(0).getAs[Long]("play_count") === 1L && out(0).isNullAt(5))
    assert(out(1).isNullAt(3) && out(1).getAs[Double]("total_watch_time") === 90.0)
    assert(out(2).isNullAt(2) && out(2).isNullAt(5)) // no visitor; percent:50 no credit
    assert(out(3).isNullAt(5)) // unknown media duration: percent:100 yields null
    assert(out.forall(_.isNullAt(4))) // play_rate always null (reference :361)
  }
}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import java.sql.Timestamp

/** Star-schema transforms on a synthetic Wistia-shaped fixture
  * (FIXTURES.md shapes; values synthetic — no reference payloads).
  */
class TransformsSpec extends SparkSpec {

  private val ingest = Timestamp.valueOf("2025-06-01 00:00:00")

  private def mediaFixture = {
    import spark.implicits._
    Seq(
      (1001L, "Intro to FB Ads", "Video", false,
        Timestamp.valueOf("2025-01-01 10:00:00"), Timestamp.valueOf("2025-02-01 10:00:00"),
        120.5, "abc123", (11L, "Proj A", "pA"), "ready"),
      (1002L, "Youtube teaser", "Video", false,
        Timestamp.valueOf("2025-01-02 10:00:00"), Timestamp.valueOf("2025-02-02 10:00:00"),
        60.0, "def456", (12L, "Proj B", "pB"), "ready"),
      (1003L, "Quarterly review", "Video", true,
        Timestamp.valueOf("2025-01-03 10:00:00"), Timestamp.valueOf("2025-02-03 10:00:00"),
        300.0, "zzz999", (13L, "Proj C", "pC"), "ready"))
      .toDF("id", "name", "type", "archived", "created", "updated",
        "duration", "hashed_id", "project_t", "status")
      .withColumn("project", struct(
        col("project_t._1").as("id"), col("project_t._2").as("name"),
        col("project_t._3").as("hashed_id")))
      .drop("project_t")
  }

  private def eventsFixture = {
    import spark.implicits._
    Seq(
      // visitor v1 watches abc123: 0.0 → 0.4 → 0.9 on one day
      ("abc123", "v1", "2025-03-01 10:00:00", Some(0.0), "e1", "1.1.1.1", "US", None: Option[String]),
      ("abc123", "v1", "2025-03-01 10:00:30", Some(0.4), "e2", "1.1.1.1", "US", None),
      ("abc123", "v1", "2025-03-01 10:01:30", Some(0.9), "e3", "1.1.1.1", "US", None),
      // v1 again next day, no progress
      ("abc123", "v1", "2025-03-02 09:00:00", Some(0.0), "e4", "1.1.1.1", "US", None),
      // v2 watches def456 with a 'play' named event but zero percent
      ("def456", "v2", "2025-03-01 12:00:00", Some(0.0), "e5", "2.2.2.2", "DE", Some("play")),
      // v3 event missing visitor-independent fields, null ip
      ("def456", "v3", "2025-03-01 13:00:00", Some(0.5), "e6", null, null, None),
      ("def456", "v3", "2025-03-01 13:00:10", Some(0.7), "e7", "3.3.3.3", "FR", None))
      .toDF("media_id", "visitor_key", "ts_s", "percent_viewed", "event_key", "ip", "country", "name")
      .withColumn("received_at", to_timestamp(col("ts_s")))
      .withColumn("region", lit("r"))
      .withColumn("city", lit("c"))
      .withColumn("user_agent_details", struct(
        lit("Chrome").as("browser"), lit("120").as("browser_version"),
        lit("Linux").as("platform"), lit(false).as("mobile")))
      .drop("ts_s")
  }

  test("dimMedia: filter + projection + channel classifier") {
    val dim = Transforms.dimMedia(mediaFixture, Seq("abc123", "def456"), ingest)
    val rows = dim.orderBy("media_id").collect()
    assert(rows.length === 2) // zzz999 filtered out (F1)
    val r0 = rows(0)
    assert(r0.getAs[String]("media_id") === "abc123")
    assert(r0.getAs[Long]("wistia_id") === 1001L)
    assert(r0.getAs[String]("title") === "Intro to FB Ads")
    assert(r0.getAs[String]("channel") === "Facebook") // "FB" substring
    assert(r0.isNullAt(r0.fieldIndex("url")))
    assert(rows(1).getAs[String]("channel") === "YouTube") // "Youtube"
  }

  test("channel classifier is case-sensitive like the reference") {
    import spark.implicits._
    val out = Seq("watch on facebook", "YT short", "FBI files", "plain")
      .toDF("t").select(Transforms.channel(col("t")).as("ch")).collect().map(_.getString(0))
    // lowercase 'facebook' does NOT match (case-sensitive contains);
    // 'FBI' DOES match "FB" — faithful to substring semantics :275
    assert(out.toSeq === Seq(null, "YouTube", "Facebook", null))
  }

  test("dimVisitor: first-occurrence dedup by time with flattened UA") {
    val dim = Transforms.dimVisitor(eventsFixture, ingest)
    val rows = dim.orderBy("visitor_id").collect()
    assert(rows.map(_.getAs[String]("visitor_id")).toSeq === Seq("v1", "v2", "v3"))
    val v3 = rows(2)
    assert(v3.isNullAt(v3.fieldIndex("ip_address"))) // first v3 event had null ip
    assert(v3.getAs[String]("user_agent_browser") === "Chrome")
    assert(v3.getAs[Boolean]("user_agent_mobile") === false)
  }

  test("factMediaEngagement: grouping, play-count fallback, watch time, play rate") {
    val durations = Transforms.dimMedia(mediaFixture, Seq("abc123", "def456"), ingest)
    val fact = Transforms.factMediaEngagement(eventsFixture, durations, ingest,
      scaleDivisor = 1.0) // corrected mode for hand-checkable numbers
    val rows = fact.orderBy("media_id", "visitor_id", "date").collect()
    assert(rows.length === 4) // (abc,v1,d1), (abc,v1,d2), (def,v2,d1), (def,v3,d1)

    val abcD1 = rows(0)
    // percent: max = 0.9; play_count: no 'play' events but progress → 1
    assert(abcD1.getAs[Double]("percent_viewed") === 0.9)
    assert(abcD1.getAs[Long]("play_count") === 1L)
    // watch: start at e2 (first pct>0 is 0.4 at 10:00:30)… tracking
    // starts at e2; e3 credits min(60, 0.5*120.5=60.25)=60
    assert(math.abs(abcD1.getAs[Double]("total_watch_time") - 60.0) < 1e-9)
    // play_rate = round2(60/120.5) = 0.5
    assert(math.abs(abcD1.getAs[Double]("play_rate") - 0.5) < 1e-9)
    assert(abcD1.getAs[String]("ip_address") === "1.1.1.1")

    val abcD2 = rows(1) // no progress day: play_count 0 forces zeros
    assert(abcD2.getAs[Long]("play_count") === 0L)
    assert(abcD2.getAs[Double]("total_watch_time") === 0.0)
    assert(abcD2.getAs[Double]("play_rate") === 0.0)

    val defV2 = rows(2) // named 'play' with zero percent: count stays 1
    assert(defV2.getAs[Long]("play_count") === 1L)
    assert(defV2.getAs[Double]("total_watch_time") === 0.0)

    val defV3 = rows(3)
    // v3: 0.5→0.7 over 10s: credit min(10, 0.2*60=12)=10
    assert(math.abs(defV3.getAs[Double]("total_watch_time") - 10.0) < 1e-9)
    // first non-null ip in time order is from the second event
    assert(defV3.getAs[String]("ip_address") === "3.3.3.3")
    assert(defV3.getAs[String]("country") === "FR")
  }

  test("perEventFact: prod-variant pure projection (A9)") {
    import spark.implicits._
    val durations = Transforms.dimMedia(mediaFixture, Seq("abc123", "def456"), ingest)
    val events = eventsFixture
      .withColumn("name",
        when(col("event_key") === "e5", "play")
          .when(col("event_key") === "e3", "percent:100"))
    val out = Transforms.perEventFact(events, durations, ingest)
    assert(out.count() === 7) // one row per event, no grouping
    val byKey = out.orderBy("event_timestamp").collect()
    val e3 = out.filter(col("event_timestamp") === Timestamp.valueOf("2025-03-01 10:01:30"))
      .collect()(0)
    assert(e3.getAs[Double]("total_watch_time") === 120.5) // percent:100 → duration
    assert(e3.isNullAt(e3.fieldIndex("play_count")))
    val e5 = out.filter(col("event_timestamp") === Timestamp.valueOf("2025-03-01 12:00:00"))
      .collect()(0)
    assert(e5.getAs[Long]("play_count") === 1L)
    assert(e5.isNullAt(e5.fieldIndex("total_watch_time")))
  }

  test("highWaterMark + incrementalSince (T1/T2)") {
    val durations = Transforms.dimMedia(mediaFixture, Seq("abc123", "def456"), ingest)
    val fact = Transforms.factMediaEngagement(eventsFixture, durations, ingest)
    val hwm = Transforms.highWaterMark(fact)
    // earliest event per group is the fact event_timestamp; max over groups
    assert(hwm.contains(Timestamp.valueOf("2025-03-02 09:00:00")))
    val inc = Transforms.incrementalSince(eventsFixture, hwm.get)
    assert(inc.count() === 0) // nothing after hwm+1s
    val incAll = Transforms.incrementalSince(eventsFixture,
      Timestamp.valueOf("2025-03-01 09:59:58"))
    assert(incAll.count() === 7)
    assert(Transforms.highWaterMark(fact.filter(lit(false))).isEmpty)
  }
}
