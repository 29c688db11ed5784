package graft.sources

import graft.SparkSpec
import graft.wistia.{ApiEndpoints, Ingest, Schemas}
import org.apache.spark.sql.functions._
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Live-API boundary (S1–S3 HTTP): the connector's http mode and the
  * Ingest lifecycle driven against an in-JVM stats-API double that
  * replicates the Wistia protocol — Bearer auth, per_page/page params,
  * events ending on an EMPTY page, media list ending on a SHORT page,
  * and a media whose page 2 returns 500 (per-media isolation).
  */
class WistiaHttpSpec extends SparkSpec {

  private val PerMedia = Map(
    "m_ok" -> 5, // 3 + 2 over two pages (per_page=3)
    "m_big" -> 7, // 3 + 3 + 1
    "m_err" -> 9) // page 1 ok, page 2 → 500: only 3 events land

  private def eventJson(media: String, i: Int): String =
    s"""{"received_at": "2025-05-${10 + i % 3}T0$i:00:00.000Z",
       | "event_key": "${media}_e$i", "visitor_key": "v${i % 4}",
       | "media_id": "$media", "percent_viewed": 0.${i}5}"""
      .stripMargin.replace("\n", "")

  private def mediaJson(i: Int): String =
    s"""{"id": $i, "hashed_id": "hm$i", "name": "Media $i", "duration": ${i * 10}.0,
       | "created": "2025-04-0${i + 1}T00:00:00.000Z",
       | "project": {"id": 1, "name": "P"}, "type": "Video"}"""
      .stripMargin.replace("\n", "")

  private var server: HttpServer = _
  private var base: String = ""
  @volatile private var sawAuth: Boolean = false
  @volatile private var sawStartDate: Option[String] = None
  private val requestedPages = scala.collection.concurrent.TrieMap.empty[String, Int]

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split('&')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split('=')
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/stats/events.json", (ex: HttpExchange) => {
      val p = params(ex)
      sawAuth |= Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains("Bearer tok123")
      p.get("start_date").foreach(d => sawStartDate = Some(d))
      val media = p("media_id")
      val page = p("page").toInt
      val per = p("per_page").toInt
      requestedPages.updateWith(media) { c => Some(c.getOrElse(0) + 1) }
      if (media == "m_err" && page >= 2) reply(ex, 500, "boom")
      else {
        val total = PerMedia.getOrElse(media, 0)
        val from = (page - 1) * per
        val items = (from until math.min(from + per, total))
          .map(i => eventJson(media, i))
        reply(ex, 200, items.mkString("[", ", ", "]"))
      }
    })
    server.createContext("/v1/medias.json", (ex: HttpExchange) => {
      val p = params(ex)
      val page = p("page").toInt
      val per = p("per_page").toInt
      val total = 5 // ends with a SHORT page when per > remaining
      val from = (page - 1) * per
      val items = (from until math.min(from + per, total)).map(mediaJson)
      reply(ex, 200, items.mkString("[", ", ", "]"))
    })
    // Show endpoint: /v1/medias/{hashed_id}.json → one media object;
    // unknown ids 404 (per-media skip), hm2 500s (error isolation)
    server.createContext("/v1/medias/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath
        .stripPrefix("/v1/medias/").stripSuffix(".json")
      requestedPages.updateWith(s"show:$id") { c => Some(c.getOrElse(0) + 1) }
      sawAuth |= Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains("Bearer tok123")
      if (id == "hm2") reply(ex, 500, "boom")
      else if (id.startsWith("hm")) reply(ex, 200, mediaJson(id.stripPrefix("hm").toInt))
      else reply(ex, 404, "{}")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def read(media: String*) = spark.read.format("wistia-raw")
    .schema(Schemas.rawEvent)
    .option("api.url", s"$base/v1/stats/events.json")
    .option("api.token", "tok123")
    .option("api.per_page", "3")
    .option("api.media_ids", media.mkString(","))
    .load()

  test("http mode: per-media partitions, empty-page pagination end, Bearer auth") {
    val df = read("m_ok", "m_big")
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 12) // 5 + 7 across page boundaries
    assert(df.select("media_id").distinct().collect().map(_.getString(0)).sorted
      === Array("m_big", "m_ok"))
    assert(sawAuth, "Bearer token header never seen by the server")
    // m_big: pages 1,2,3 full/partial + page 4 empty probe = 4 requests
    assert(requestedPages("m_big") >= 4)
  }

  test("http mode: media_id pushdown restricts partitions; error page isolates") {
    val one = read("m_ok", "m_big", "m_err").filter(col("media_id") === "m_ok")
    assert(one.rdd.getNumPartitions === 1)
    assert(one.count() === 5)

    // m_err 500s on page 2: its first page (3 events) stands, scan succeeds
    val withErr = read("m_ok", "m_err")
    assert(withErr.count() === 5 + 3)
  }

  test("http mode: received_at lower bound is pushed as start_date") {
    sawStartDate = None
    val bound = java.sql.Timestamp.from(java.time.Instant.parse("2025-05-11T00:00:00Z"))
    val df = read("m_ok").filter(col("received_at") >= lit(bound))
    val n = df.count()
    assert(sawStartDate === Some("2025-05-11"), "start_date param not pushed")
    // rows are exactly re-filtered by Spark regardless of API coarseness
    val expected = (0 until 5).count(i => 10 + i % 3 >= 11)
    assert(n === expected)
  }

  test("Ingest.runIngestion: media list (short-page end) + events land in the raw zone") {
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    val stamp = Ingest.runIngestion(spark,
      ApiEndpoints(s"$base/v1/stats/events.json", s"$base/v1/medias.json"),
      token = "tok123", mediaIdsForEvents = Seq("m_ok", "m_big", "m_err"),
      rawRoot = dir, stamp = "20250512_000000")
    assert(stamp === "20250512_000000")
    assert(RawZone.latestRun(spark, dir, "media") === Some("20250512_000000"))
    val media = RawZone.readLatestRun(spark, dir, "media", Schemas.rawMedia).get
    assert(media.count() === 5)
    val events = RawZone.readLatestRun(spark, dir, "events", Schemas.rawEvent).get
    // default per_page=100: every media fits on page 1, so even m_err's 9
    // events land before its page-2 500 ends pagination → 5 + 7 + 9
    assert(events.count() === 21)
    // the landed raw zone feeds the existing batch lifecycle unchanged
    val dim = graft.wistia.Transforms.dimMedia(media, Seq("hm1", "hm2"),
      new java.sql.Timestamp(0L))
    assert(dim.count() === 2)
  }

  test("Ingest show mode: per-media Show endpoint, 4-field v1 projection, error skip") {
    // direct endpoint contract: one GET, None on 404/500
    assert(WistiaHttp.show(s"$base/v1/medias", "tok123", "nope").isEmpty)
    assert(WistiaHttp.show(s"$base/v1/medias", "tok123", "hm2").isEmpty) // 500
    assert(WistiaHttp.show(s"$base/v1/medias", "tok123", "hm1").nonEmpty)
    assert(requestedPages("show:hm2") === 1, "Show must not retry (reference: None and move on)")

    val dir = java.nio.file.Files.createTempDirectory("ingest_v1").toString
    Ingest.runIngestion(spark,
      ApiEndpoints(s"$base/v1/stats/events.json", s"$base/v1/medias.json",
        mediaShowUrlBase = s"$base/v1/medias"),
      token = "tok123", mediaIdsForEvents = Seq("hm1", "hm2", "hm3"),
      rawRoot = dir, stamp = "20250513_000000", mediaMode = "show")
    val media = RawZone.readLatestRun(spark, dir, "media", Schemas.rawMedia).get
    assert(media.count() === 2) // hm2's 500 skipped, hm1/hm3 landed
    val meta = graft.wistia.Transforms.mediaMetadataV1(media)
    assert(meta.columns.toSeq === Seq("id", "hashed_id", "title", "created_at"))
    val row = meta.orderBy("id").collect()(0)
    assert(row.getLong(0) === 1L && row.getString(1) === "hm1" &&
      row.getString(2) === "Media 1" &&
      row.getTimestamp(3) === java.sql.Timestamp.from(
        java.time.Instant.parse("2025-04-02T00:00:00Z")))
  }
}
