package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Transient-failure posture at the HTTP ingestion boundary: the
  * reference stops-and-moves-on on ANY error (retry left as a comment,
  * ingest_wistia_v1.py:255) and `maxAttempts = 1` keeps that contract
  * bit-for-bit; `api.max_attempts > 1` opts into bounded backoff for
  * fleet-scale reads, where a 1000-task scan makes transient 429/503
  * the common case. Pure-JVM spec (no Spark session needed) against an
  * in-process flaky API double; sleeps are injected and recorded, so
  * the backoff schedule itself is asserted, not just the outcome.
  */
class WistiaRetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = ""
  private val hits = scala.collection.concurrent.TrieMap.empty[String, AtomicInteger]

  private def reply(ex: HttpExchange, code: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def nth(route: String): Int =
    hits.getOrElseUpdate(route, new AtomicInteger(0)).incrementAndGet()

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // 429 (Retry-After: 7) then 503 (no header) then 200
    server.createContext("/flaky.json", (ex: HttpExchange) => nth("flaky") match {
      case 1 => reply(ex, 429, """{"error":"rate limited"}""",
        Map("Retry-After" -> "7"))
      case 2 => reply(ex, 503, "")
      case _ => reply(ex, 200, """[{"ok":1}]""")
    })
    // terminal 4xx must NOT retry
    server.createContext("/gone.json", (ex: HttpExchange) => {
      nth("gone"); reply(ex, 404, "")
    })
    // events pagination: page 1 needs one retry, page 2 is empty (end)
    server.createContext("/events.json", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split('&').collectFirst { case p if p.startsWith("page=") =>
          p.stripPrefix("page=") }.getOrElse("?")
      if (page == "1" && nth("ev_p1") == 1)
        reply(ex, 429, "", Map("Retry-After" -> "0"))
      else if (page == "1") reply(ex, 200, """[{"event_key":"e1"}]""")
      else reply(ex, 200, "[]")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("getRetrying: Retry-After honored, exponential+jitter otherwise, bounded attempts") {
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val got = WistiaHttp.getRetrying(s"$base/flaky.json", "tok",
      maxAttempts = 4, baseDelayMs = 500L, sleep = slept += _)
    assert(got === Some("""[{"ok":1}]"""))
    assert(hits("flaky").get === 3)
    // delay 1 = the server's Retry-After (7 s); delay 2 = exponential
    // (500 << 1 = 1000) + deterministic per-(url, attempt) jitter < 251
    assert(slept.size === 2)
    assert(slept(0) === 7000L)
    assert(slept(1) >= 1000L && slept(1) < 1251L)
  }

  test("getRetrying: maxAttempts = 1 is the reference's no-retry stance") {
    hits.remove("flaky")
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val got = WistiaHttp.getRetrying(s"$base/flaky.json", "tok",
      maxAttempts = 1, sleep = slept += _)
    assert(got === None) // first answer was the 429; no second exchange
    assert(hits("flaky").get === 1)
    assert(slept.isEmpty)
  }

  test("getRetrying: a terminal 4xx never retries") {
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val got = WistiaHttp.getRetrying(s"$base/gone.json", "tok",
      maxAttempts = 4, sleep = slept += _)
    assert(got === None)
    assert(hits("gone").get === 1)
    assert(slept.isEmpty)
  }

  test("eventPages with maxAttempts > 1 survives a transient page; default loses it") {
    val pages = WistiaHttp.eventPages(s"$base/events.json", "tok", "m1",
      perPage = 5, startDate = None, endDate = None, maxAttempts = 3).toSeq
    assert(pages === Seq("""[{"event_key":"e1"}]"""))
    // default (faithful) pagination: the transient 429 ends the media
    hits.remove("ev_p1")
    val faithful = WistiaHttp.eventPages(s"$base/events.json", "tok", "m1",
      perPage = 5, startDate = None, endDate = None).toSeq
    assert(faithful === Seq.empty)
  }
}
