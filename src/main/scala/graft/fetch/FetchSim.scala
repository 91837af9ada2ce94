package graft.fetch

import graft.functions.UrlFns
import graft.model.Model._

/**
 * Deterministic synthetic web + fetcher.
 *
 * The reference fetches via a real headless Chromium over CDP
 * (/root/reference/worker.go:494-656). This sandbox has no network, so the
 * fetch stage is a PURE function `url → FetchResult` reproducing the exact
 * event shapes the reference's tests exercise (worker_test.go:275-444):
 * basic / tls / no-server / notfound / console / redirect / subresource /
 * post / chain-N, plus a seeded scale-free web for frontier & skew
 * benchmarks. The interface is one pluggable function, so a real CDP
 * fetcher can replace it without touching the pipeline.
 *
 * Determinism: FNV-1a 64-bit of (seed, url); a virtual clock orders events.
 */
class FetchSim(
    val numHosts: Int = 100,
    val pagesPerHost: Int = 50,
    val linksPerPage: Int = 4,
    val chainLength: Int = 100,
    val seed: Long = 42L,
    /** When false, `screenshot_bytes` payloads are omitted (refs and every
      * other event are unchanged). Benches that run with the content store
      * off (`storeFiles = false`) skip generating 256 B + a hex-string
      * chain per URL that nothing would read — allocation bandwidth is the
      * contended resource at high thread counts. */
    val screenshotPayloads: Boolean = true)
    extends Serializable {

  import FetchSim._

  /** Fraction of cross-host links landing on host 0 — the deliberate hot
    * host for skew/salting tests (north rule: explicit skew handling). */
  private val hotHostBias = 3 // of 10 cross-host links

  def fetch(url: String): FetchResult = {
    val host = UrlFns.hostOf(url)
    if (host == null) return errorResult(url, "net::ERR_NAME_NOT_RESOLVED")
    host match {
      case "fixture.test" => fetchFixture(url)
      case "chain.test" => fetchChain(url)
      case h if h.startsWith("h") && h.endsWith(".test") => fetchSynth(url, h)
      case _ => errorResult(url, "net::ERR_CONNECTION_REFUSED")
    }
  }

  // ---------- fixtures (worker_test.go:275-444 analogues) ----------

  private def fetchFixture(url: String): FetchResult = {
    val path = pathOf(url)
    path match {
      case "/basic" =>
        page(url, body = "hello world", mime = "text/plain")
      case "/tls" =>
        page(url, body = "hello world", mime = "text/plain", tls = true)
      case "/no-server" =>
        errorResult(url, "net::ERR_CONNECTION_REFUSED")
      case "/notfound" =>
        page(url, body = "not found", mime = "text/plain", status = 404)
      case "/console" =>
        val html = "<html><body><script>console.log('a', 'a');console.log('b');</script></body></html>"
        val base = page(url, body = html, mime = "text/html")
        base.copy(console = Seq(
          ConsoleEvent("a a", 1, 10, "anonymous", url),
          ConsoleEvent("b", 1, 32, "anonymous", url)))
      case "/redirect" =>
        redirectChain(url, Seq("/redirect2", "/redirect3"), "hello world")
      case "/redirect-cdp" =>
        // SAME chain, but in real-CDP event shape: no standalone response
        // events for the hops — each hop's response rides on the NEXT
        // request's redirectResponse (the worker.go:1043-1046 backfill path
        // a live fetcher exercises). Must correlate identically.
        redirectChainCdp(url, Seq("/redirect2", "/redirect3"), "hello world")
      case "/orphan" =>
        // a parented request whose parent never gets ANY response: the
        // reference classifies the CHILD as `user` (worker.go:1088-1091)
        orphanParent(url)
      case "/subresource" =>
        withSubresource(url, "<html><body><img src=\"/missing.png\"></body></html>",
          "/missing.png", subStatus = 404, subInitiator = "parser")
      case "/post" =>
        val html = "<html><body><script>post()</script></body></html>"
        withPost(url, html, "/api", "some_data")
      case _ =>
        page(url, body = "hello world", mime = "text/plain")
    }
  }

  private def fetchChain(url: String): FetchResult = {
    val idx = pathOf(url).stripPrefix("/p/").toIntOption.getOrElse(0)
    val body =
      if (idx >= chainLength - 1) "<html><body>end</body></html>"
      else s"""<html><body><a href="/p/${idx + 1}">next</a></body></html>"""
    page(url, body = body, mime = "text/html")
  }

  // ---------- scale-free synthetic web ----------

  private def fetchSynth(url: String, host: String): FetchResult = {
    val h = mix(url)
    val hostIdx = host.stripPrefix("h").stripSuffix(".test").toIntOption.getOrElse(0)
    val kind = (h % 100 + 100) % 100
    if (kind < 8) {
      // single-hop same-host redirect
      val target = s"/p/${((h >>> 8) % pagesPerHost + pagesPerHost) % pagesPerHost}"
      redirectChain(url, Seq(target), synthBody(url, hostIdx, mix(url + target)))
    } else if (kind < 12) {
      page(url, body = "not found", mime = "text/plain", status = 404)
    } else if (kind < 14) {
      errorResult(url, "net::ERR_CONNECTION_REFUSED")
    } else {
      val body = synthBody(url, hostIdx, h)
      val base = page(url, body = body, mime = "text/html", tls = false)
      val withCon =
        if (kind % 5 == 0)
          base.copy(console = Seq(ConsoleEvent(s"log ${kind % 7}", 1, 1, "anonymous", url)))
        else base
      if (kind % 7 == 0) addSubresource(withCon, url, "/img.png", 404, "parser") else withCon
    }
  }

  /** Deterministic html body with `linksPerPage` anchors: ~70% same-host
    * relative hrefs, rest absolute cross-host with a deliberate hot-host
    * bias (skew). Byte-identical to the interpolation form it replaces —
    * the hot path builds straight into one StringBuilder and extends the
    * streaming FNV instead of allocating a `"$url#$i"` string per link. */
  private def synthBody(url: String, hostIdx: Int, h0: Long): String = {
    val sb = new java.lang.StringBuilder(96 + 40 * linksPerPage)
    sb.append("<html><body>")
    // fnv1a("$seed|$url#") once; per link extend with the digits of i
    val urlHash = fnv1aCont(fnv1aCont(seedPrefixHash, url), "#")
    var i = 0
    while (i < linksPerPage) {
      val h = fnv1aContInt(urlHash, i)
      val page = ((h >>> 16) % pagesPerHost + pagesPerHost) % pagesPerHost
      val r = ((h % 10) + 10) % 10
      if (r < 7)
        sb.append("<a href=\"/p/").append(page).append("\">p")
          .append(page).append("</a>")
      else {
        val cross = ((h >>> 24) % 10 + 10) % 10
        val th =
          if (cross < hotHostBias) 0L
          else (((h >>> 32) % numHosts) + numHosts) % numHosts
        sb.append("<a href=\"http://h").append(th).append(".test/p/")
          .append(page).append("\">x").append(page).append("</a>")
      }
      i += 1
    }
    sb.append("<p>doc ").append(sha8(url)).append(' ')
    appendWordsFor(sb, h0)
    sb.append("</p></body></html>")
    sb.toString
  }

  private def appendWordsFor(sb: java.lang.StringBuilder, h: Long): Unit = {
    var i = 0
    while (i < 8) {
      if (i > 0) sb.append(' ')
      sb.append(FetchSim.dict(
        (((h >>> (i * 5)) % FetchSim.dict.length) + FetchSim.dict.length).toInt
          % FetchSim.dict.length))
      i += 1
    }
  }

  // ---------- event assembly ----------

  private def reqHeaders(url: String): Map[String, String] = Map(
    "User-Agent" -> "graft/1.0",
    "Host" -> UrlFns.hostOf(url),
    "Accept" -> "*/*")

  private def respHeaders(mime: String, extra: (String, String)*): Map[String, String] =
    (Map("Content-Type" -> mime, "Server" -> "synth/1") ++ extra.toMap)

  private def secOf(url: String, tls: Boolean): RespEvent => RespEvent = r =>
    if (!tls) r
    else {
      val host = UrlFns.hostOf(url)
      r.copy(
        protocol = "h2",
        sec_protocol = "TLS 1.3",
        sec_key_exchange = "X25519",
        sec_issuer = "Synthetic Root CA",
        sec_cipher = "AES_128_GCM",
        sec_san_list = Seq(host, "*." + host),
        sec_subject = host,
        sec_valid_from = 1577836800L,
        sec_valid_to = 1893456000L)
    }

  private def emptyResp(rid: String, ts: Double): RespEvent =
    RespEvent(rid, 0, Map.empty, "", "http/1.1", "", "", "", "", Seq.empty, "", 0L, 0L, ts)

  private def shotBytes(url: String): Seq[Array[Byte]] =
    if (screenshotPayloads) Seq(screenshotBytes(url)) else Seq.empty

  /** One-action page. */
  private def page(url: String, body: String, mime: String, status: Int = 200,
      tls: Boolean = false): FetchResult = {
    val rid = "r0_" + sha8(url)
    val req = ReqEvent(rid, "", url, "GET", reqHeaders(url), "", "user", "", 0, 0, 0.01)
    val resp = secOf(url, tls)(
      emptyResp(rid, 0.05).copy(status = status, headers = respHeaders(mime), mime = mime))
    val bodyEv = BodyEvent(rid, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    FetchResult(url, Seq(req), Seq(resp), Seq.empty, Seq(bodyEv), Seq.empty,
      Seq(screenshotRef(url)), 0.0, 0.5, 1.5,
      shotBytes(url))
  }

  /** N-hop same-host redirect chain ending in a 200 with `finalBody`
    * (worker_test.go:372-382; parenting per worker.go:1043-1046). */
  private def redirectChain(url: String, hops: Seq[String], finalBody: String): FetchResult = {
    val base = new java.net.URI(url)
    val origin = base.getScheme + "://" + base.getHost
    val urls = url +: hops.map(origin + _)
    val h8 = sha8(url)
    val rids = urls.indices.map(i => s"r${i}_" + h8)
    val reqs = urls.indices.map { i =>
      ReqEvent(rids(i), if (i == 0) "" else rids(i - 1), urls(i), "GET",
        reqHeaders(urls(i)), "", if (i == 0) "user" else "other", "", 0, 0, 0.01 * (i + 1))
    }
    val resps = urls.indices.map { i =>
      if (i < urls.length - 1)
        emptyResp(rids(i), 0.05 + 0.01 * i).copy(status = 301,
          headers = respHeaders("", "Location" -> urls(i + 1)))
      else
        emptyResp(rids(i), 0.05 + 0.01 * i).copy(status = 200,
          headers = respHeaders("text/plain"), mime = "text/plain")
    }
    val bodyEv = BodyEvent(rids.last,
      finalBody.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    FetchResult(url, reqs, resps, Seq.empty, Seq(bodyEv), Seq.empty,
      Seq(screenshotRef(url)), 0.0, 0.5, 1.5,
      shotBytes(url))
  }

  /** redirectChain in REAL CDP event shape: hop responses exist ONLY as
    * `redirect_resp` on the following request (no responseReceived for the
    * hop). Output must equal the explicit-response form. */
  private def redirectChainCdp(url: String, hops: Seq[String],
      finalBody: String): FetchResult = {
    val base = new java.net.URI(url)
    val origin = base.getScheme + "://" + base.getHost
    val urls = url +: hops.map(origin + _)
    val h8 = sha8(url)
    val rids = urls.indices.map(i => s"r${i}_" + h8)
    val reqs = urls.indices.map { i =>
      val redirResp =
        if (i == 0) None
        else Some(emptyResp(rids(i - 1), 0.05 + 0.01 * (i - 1)).copy(status = 301,
          headers = respHeaders("", "Location" -> urls(i))))
      ReqEvent(rids(i), if (i == 0) "" else rids(i - 1), urls(i), "GET",
        reqHeaders(urls(i)), "", if (i == 0) "user" else "other", "", 0, 0,
        0.01 * (i + 1), redirResp)
    }
    val lastResp = emptyResp(rids.last, 0.1).copy(status = 200,
      headers = respHeaders("text/plain"), mime = "text/plain")
    val bodyEv = BodyEvent(rids.last,
      finalBody.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    FetchResult(url, reqs, Seq(lastResp), Seq.empty, Seq(bodyEv), Seq.empty,
      Seq(screenshotRef(url)), 0.0, 0.5, 1.5,
      shotBytes(url))
  }

  /** A main request that never receives a response, plus a script-initiated
    * child parented onto it — reference classifies the child `user`
    * (worker.go:1088-1091: parent without response). */
  private def orphanParent(url: String): FetchResult = {
    val base = new java.net.URI(url)
    val origin = base.getScheme + "://" + base.getHost
    val mainRid = "r0_" + sha8(url)
    val childRid = "r1_" + sha8(url)
    val main = ReqEvent(mainRid, "", url, "GET", reqHeaders(url), "", "user", "", 0, 0, 0.01)
    val childUrl = origin + "/beacon"
    val child = ReqEvent(childRid, mainRid, childUrl, "GET", reqHeaders(childUrl), "",
      "script", "send", 1, 2, 0.02)
    val childResp = emptyResp(childRid, 0.05).copy(status = 200,
      headers = respHeaders("text/plain"), mime = "text/plain")
    FetchResult(url, Seq(main, child), Seq(childResp), Seq.empty, Seq.empty,
      Seq.empty, Seq.empty, 0.0, 0.0, 0.1)
  }

  private def withSubresource(url: String, html: String, subPath: String,
      subStatus: Int, subInitiator: String): FetchResult =
    addSubresource(page(url, html, "text/html"), url, subPath, subStatus, subInitiator)

  private def addSubresource(fr: FetchResult, url: String, subPath: String,
      subStatus: Int, subInitiator: String): FetchResult = {
    val base = new java.net.URI(url)
    val subUrl = base.getScheme + "://" + base.getHost + subPath
    val mainRid = fr.requests.head.request_id
    val rid = s"r${fr.requests.length}_" + sha8(url)
    val req = ReqEvent(rid, mainRid, subUrl, "GET", reqHeaders(subUrl), "",
      subInitiator, "", 0, 0, 0.2)
    val resp = emptyResp(rid, 0.25).copy(status = subStatus,
      headers = respHeaders("text/plain"), mime = "text/plain")
    fr.copy(requests = fr.requests :+ req, responses = fr.responses :+ resp)
  }

  private def withPost(url: String, html: String, apiPath: String,
      postData: String): FetchResult = {
    val fr = page(url, html, "text/html")
    val base = new java.net.URI(url)
    val apiUrl = base.getScheme + "://" + base.getHost + apiPath
    val mainRid = fr.requests.head.request_id
    val rid = "r1_" + sha8(url)
    val req = ReqEvent(rid, mainRid, apiUrl, "POST",
      reqHeaders(apiUrl) + ("Content-Type" -> "application/x-www-form-urlencoded"),
      postData, "script", "post", 3, 7, 0.3)
    val resp = emptyResp(rid, 0.35).copy(status = 200,
      headers = respHeaders("application/json"), mime = "application/json")
    val bodyEv = BodyEvent(rid, "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    fr.copy(requests = fr.requests :+ req, responses = fr.responses :+ resp,
      bodies = fr.bodies :+ bodyEv)
  }

  private def errorResult(url: String, err: String): FetchResult = {
    val rid = "r0_" + sha8(url)
    val req = ReqEvent(rid, "", url, "GET", reqHeaders(url), "", "user", "", 0, 0, 0.01)
    FetchResult(url, Seq(req), Seq.empty, Seq(ErrEvent(rid, err, 0.05)),
      Seq.empty, Seq.empty, Seq.empty, 0.0, 0.0, 0.1)
  }

  /** Deterministic screenshot media_ref: domain-dir layout like the
    * reference's screenshot store (store/file.go:208-251), but content-
    * derived name instead of rand16 — rand breaks round replayability. */
  def screenshotRef(url: String): String = {
    val host = UrlFns.hostOf(url)
    val dir = Option(UrlFns.etld1(host)).getOrElse(host)
    s"screenshots/$dir/${sha8(url)}-1366x768.png"
  }

  /** Deterministic stand-in PNG payload (real 8-byte PNG magic + seeded
    * bytes): no renderer exists in this sandbox, but the STORE path —
    * write, domain layout, readback-intact (TestScreenshotStore,
    * store/file_test.go:92-157) — is the real thing. A CDP fetcher swaps
    * in real capture bytes here. */
  def screenshotBytes(url: String): Array[Byte] = {
    val out = new Array[Byte](256)
    val magic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    System.arraycopy(magic, 0, out, 0, 8)
    var h = mix("png|" + url)
    var i = 8
    while (i < out.length) {
      if (i % 8 == 0) h = FetchSim.fnv1a(java.lang.Long.toHexString(h))
      out(i) = ((h >>> ((i % 8) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** fnv1a("$seed|") — FNV-1a is a left fold, so hashing a prefix once and
    * continuing over the suffix equals hashing the concatenation. */
  private val seedPrefixHash: Long = fnv1a(s"$seed|")

  private def mix(s: String): Long = fnv1aCont(seedPrefixHash, s)

  /** Seed-list generator for benches: `count` URLs over the synthetic web. */
  def seedUrls(count: Int): Seq[String] =
    (0 until count).map { i =>
      val h = (((mix(s"seed$i") % numHosts) + numHosts) % numHosts).toInt
      val p = (((mix(s"page$i") % pagesPerHost) + pagesPerHost) % pagesPerHost).toInt
      s"http://h$h.test/p/$p"
    }.distinct
}

object FetchSim {
  private[fetch] val dict = Array("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  def fnv1a(s: String): Long = fnv1aCont(0xcbf29ce484222325L, s)

  /** Continue an FNV-1a fold over `s` (h(prefix + s) = fnv1aCont(h(prefix), s)). */
  def fnv1aCont(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Continue an FNV-1a fold over the decimal digits of `i` (i ≥ 0) —
    * identical to fnv1aCont(h0, i.toString) without the allocation. */
  def fnv1aContInt(h0: Long, i: Int): Long = {
    if (i >= 10) {
      val q = i / 10
      val h = fnv1aContInt(h0, q)
      val c = ('0' + (i - q * 10)).toChar
      var x = h ^ c.toLong
      x *= 0x100000001b3L
      x
    } else {
      var h = h0 ^ ('0' + i).toChar.toLong
      h *= 0x100000001b3L
      h
    }
  }

  def sha8(s: String): String = UrlFns.sha256Hex(s).substring(0, 8)

  def pathOf(url: String): String = {
    try {
      val p = new java.net.URI(url).getPath
      if (p == null || p.isEmpty) "/" else p
    } catch { case _: Exception => "/" }
  }
}
