package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Minimal HTTP pagination client for the Wistia-style stats API
  * (reference `ingest_wistia.py:184-304`), replicating its protocol
  * exactly:
  *
  *  - `Authorization: Bearer <token>` header, 60 s timeout per request;
  *  - events pages: `?media_id=…&per_page=…&page=N[&start_date=…]
  *    [&end_date=…]`, advancing until an EMPTY page (`:257-261` — a
  *    short page does NOT stop the loop);
  *  - media-list pages: `?per_page=…&page=N`, stopping on an empty OR
  *    short page (`:213-222` — the List endpoint contract);
  *  - any error (non-2xx, timeout, IO) stops pagination and returns what
  *    was fetched so far (`:286-300` — per-media failure isolation, the
  *    caller records partial results instead of failing the run).
  *
  * Pure JVM (java.net.http), no Spark types — usable from the DSv2
  * reader on executors and from driver-side ingestion alike.
  */
object WistiaHttp {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(60))
    .build()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** One exchange's observable outcome; None = IO error/timeout. */
  private[sources] case class Exchange(status: Int, body: String,
      retryAfterMs: Option[Long])

  private def exchange(url: String, token: String): Option[Exchange] =
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(60)).GET()
      if (token.nonEmpty) b.header("Authorization", s"Bearer $token")
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      val ra = {
        val v = resp.headers().firstValue("Retry-After")
        if (v.isPresent) v.get.trim.toLongOption.map(_ * 1000L) else None
      }
      Some(Exchange(resp.statusCode(), resp.body(), ra))
    } catch { case _: Exception => None }

  /** One GET; Some(body) on 2xx, None otherwise. */
  def get(url: String, token: String): Option[String] =
    exchange(url, token) match {
      case Some(e) if e.status / 100 == 2 => Some(e.body)
      case _ => None
    }

  /** GET with bounded backoff on TRANSIENT failures — 429 and 5xx
    * (honoring a numeric `Retry-After`, capped at 60 s) and IO errors/
    * timeouts; any other non-2xx is terminal (a bad request stays bad).
    * Delay doubles per attempt from `baseDelayMs`, plus a DETERMINISTIC
    * per-(url, attempt) jitter so a fleet of executors rate-limited in
    * the same instant does not re-stampede the API in the same instant
    * either. `maxAttempts = 1` is exactly [[get]] — the reference's
    * stop-and-move-on stance (ingest_wistia_v1.py:255 leaves retry as a
    * comment), kept as the default at every call site; retrying is the
    * opt-in SCALE posture for fleet concurrency, where transient
    * 429/503 is the common case, not the exception. `sleep` is
    * injectable for deterministic tests.
    */
  def getRetrying(url: String, token: String, maxAttempts: Int,
      baseDelayMs: Long = 500L,
      sleep: Long => Unit = Thread.sleep): Option[String] = {
    var attempt = 1
    while (attempt <= maxAttempts) {
      val ex = exchange(url, token)
      ex match {
        case Some(e) if e.status / 100 == 2 => return Some(e.body)
        case Some(e) if e.status != 429 && e.status / 100 != 5 => return None
        case _ => // 429 / 5xx / IO error: transient
          if (attempt == maxAttempts) return None
          val backoff = baseDelayMs << (attempt - 1)
          val jitter = Math.floorMod(
            scala.util.hashing.MurmurHash3.stringHash(s"$url#$attempt"),
            (baseDelayMs / 2 + 1).toInt).toLong
          val delay = ex.flatMap(_.retryAfterMs) match {
            case Some(ra) => math.min(ra, 60000L)
            case None => backoff + jitter
          }
          sleep(delay)
          attempt += 1
      }
    }
    None
  }

  /** Does a JSON array body hold zero records? (whitespace-tolerant;
    * `[]` ends events pagination exactly like the reference's falsy
    * check on the decoded list.)
    */
  private[sources] def isEmptyArray(body: String): Boolean = {
    val t = body.trim
    t.isEmpty || t == "[]" || t.replaceAll("\\s", "") == "[]"
  }

  /** Rough record count of a top-level JSON array (object depth scan) —
    * only used for the media-list short-page stop, where the reference
    * compares `len(page) < per_page`.
    */
  private[sources] def arrayLen(body: String): Int = {
    var depth = 0
    var n = 0
    var inStr = false
    var esc = false
    body.foreach { c =>
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1; if (depth == 1) n += 1
        case '}' => depth -= 1
        case _ => ()
      }
    }
    n
  }

  /** Lazily paginated event pages for one media: yields each non-empty
    * page body until an empty page or an error (error → iterator simply
    * ends; the pages already yielded stand, matching the reference's
    * stop-on-error isolation).
    */
  def eventPages(baseUrl: String, token: String, mediaId: String,
      perPage: Int, startDate: Option[String], endDate: Option[String],
      maxAttempts: Int = 1): Iterator[String] =
    new Iterator[String] {
      private var page = 1
      private var nextBody: Option[String] = None
      private var done = false
      private def advance(): Unit = if (!done && nextBody.isEmpty) {
        val params = Seq(
          Some(s"media_id=${enc(mediaId)}"),
          Some(s"per_page=$perPage"),
          Some(s"page=$page"),
          startDate.map(d => s"start_date=${enc(d)}"),
          endDate.map(d => s"end_date=${enc(d)}")).flatten.mkString("&")
        getRetrying(s"$baseUrl?$params", token, maxAttempts) match {
          case Some(body) if !isEmptyArray(body) =>
            nextBody = Some(body); page += 1
          case _ => done = true // empty page or error: stop (reference :257,:286)
        }
      }
      override def hasNext: Boolean = { advance(); nextBody.nonEmpty }
      override def next(): String = {
        advance()
        val b = nextBody.getOrElse(throw new NoSuchElementException)
        nextBody = None
        b
      }
    }

  /** Single-item Media Show endpoint (reference `ingest_wistia_v1.py:
    * 163-207` fetch_media_metadata): one GET to `{base}/{id}.json`;
    * Some(body) on 2xx, None on any error or non-2xx — the caller skips
    * that media and continues, matching the reference's per-media
    * None-and-move-on isolation (no retry).
    */
  def show(showUrlBase: String, token: String, mediaId: String,
      maxAttempts: Int = 1): Option[String] =
    getRetrying(s"${showUrlBase.stripSuffix("/")}/${enc(mediaId)}.json", token,
      maxAttempts)

  /** All media-list pages (driver-side; the list is small). Stops on
    * empty OR short page like the reference's List-endpoint loop.
    */
  def mediaPages(baseUrl: String, token: String, perPage: Int,
      maxAttempts: Int = 1): Seq[String] = {
    val out = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done) {
      getRetrying(s"$baseUrl?per_page=$perPage&page=$page", token, maxAttempts) match {
        case Some(body) if !isEmptyArray(body) =>
          out += body
          if (arrayLen(body) < perPage) done = true else page += 1
        case _ => done = true
      }
    }
    out.result()
  }
}
