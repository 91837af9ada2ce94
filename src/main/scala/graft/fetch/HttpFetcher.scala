package graft.fetch

import graft.model.Model._

/**
 * Minimal real-socket fetcher behind the [[FetchSim]] seam: plain HTTP
 * GET over the JDK HttpClient, redirects followed MANUALLY so each hop
 * lands as its own (request, response) event pair with the previous hop
 * as its loader — the same chained shape the simulator's redirectChain
 * and the reference's CDP events produce (worker.go:1043-1046 parenting).
 *
 * This is the sandbox's closest analogue of the reference's live
 * Chromium worker (worker.go:494-656): no JavaScript, console, or
 * screenshots (those event kinds stay empty), but URLs, methods, real
 * request/response headers, status codes, negotiated protocol, and body
 * bytes all come off an actual socket, and the whole downstream pipeline
 * (correlation, span assembly, link extraction, frontier expansion,
 * warehouse) consumes them unchanged. CrawlerSpec drives a full crawl
 * through it against an in-JVM loopback server — the end-to-end proof of
 * the "pluggable fetch" claim.
 *
 * Loopback-scoped by intent: this sandbox has no egress, and a crawler
 * pointed at the real internet should run with the politeness/robots
 * machinery on ([[graft.pipeline.CrawlConfig]]).
 */
class HttpFetcher(timeoutMs: Long = 5000, maxHops: Int = 8)
    extends FetchSim {

  // one client per JVM worker; HttpClient is not serializable, the
  // fetcher object is — executors rebuild it lazily after deserialization
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()

  private val ua = "graft-crawler/0.4"

  override def fetch(url: String): FetchResult = {
    val h8 = FetchSim.sha8(url)
    val t0 = System.nanoTime()
    def ts(): Double = (System.nanoTime() - t0) / 1e9
    val reqs = scala.collection.mutable.ArrayBuffer.empty[ReqEvent]
    val resps = scala.collection.mutable.ArrayBuffer.empty[RespEvent]
    var body: Option[BodyEvent] = None
    var err: Option[ErrEvent] = None
    var cur = url
    var hop = 0
    var done = false
    while (!done && hop < maxHops) {
      val rid = s"r${hop}_$h8"
      reqs += ReqEvent(rid, if (hop == 0) "" else s"r${hop - 1}_$h8", cur,
        "GET", Map("User-Agent" -> ua), "",
        if (hop == 0) "user" else "other", "", 0, 0, ts())
      try {
        val httpReq = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(cur))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("User-Agent", ua)
          .GET().build()
        val resp = client.send(httpReq,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        // first value per header name (JDK normalizes names to lowercase);
        // HTTP/2 pseudo-headers (":status") never reach HttpHeaders
        val headers: Map[String, String] = {
          import scala.jdk.CollectionConverters._
          resp.headers().map().asScala.iterator.collect {
            case (k, vs) if !vs.isEmpty => k -> vs.get(0)
          }.toMap
        }
        val mime = headers.getOrElse("content-type", "").takeWhile(_ != ';').trim
        val protocol = resp.version() match {
          case java.net.http.HttpClient.Version.HTTP_2 => "h2"
          case _ => "http/1.1"
        }
        resps += RespEvent(rid, resp.statusCode(), headers, mime, protocol,
          "", "", "", "", Seq.empty, "", 0L, 0L, ts())
        val loc = resp.headers().firstValue("location")
        if (resp.statusCode() / 100 == 3 && loc.isPresent) {
          cur = java.net.URI.create(cur).resolve(loc.get.trim).toString
          hop += 1
        } else {
          val bytes = resp.body()
          if (bytes != null && bytes.nonEmpty) body = Some(BodyEvent(rid, bytes))
          done = true
        }
      } catch {
        case _: java.net.ConnectException =>
          err = Some(ErrEvent(rid, "net::ERR_CONNECTION_REFUSED", ts())); done = true
        case _: java.net.http.HttpTimeoutException =>
          err = Some(ErrEvent(rid, "net::ERR_TIMED_OUT", ts())); done = true
        case e: Throwable =>
          err = Some(ErrEvent(rid, s"net::ERR_FAILED (${e.getClass.getSimpleName})", ts()))
          done = true
      }
    }
    FetchResult(url, reqs.toSeq, resps.toSeq, err.toSeq, body.toSeq,
      Seq.empty, Seq.empty, 0.0, ts(), ts())
  }
}
