package graft.sources

/**
 * S4's real HTTP transport: the conditional-GET poll loop of the
 * reference's PhishTank provider (provider.go:179-216), previously
 * substituted by bare file arrival. Each tick sends ONE GET with
 * `If-None-Match: <last ETag>`; a 304 — or a 200 whose ETag equals the
 * stored one, the client-side equality check the reference performs at
 * provider.go:201-206 — means "feed unchanged, skip". A changed snapshot
 * is written ATOMICALLY (temp file + same-directory rename) into the
 * directory watched by [[Providers.feedStreamHwm]], gzip'd bytes kept
 * verbatim as `*.json.gz` (provider.go:213 gunzips; here Spark's file
 * source does, by extension — sniffed from the gzip magic, not the URL,
 * so a transparently-decompressing proxy can't mislabel the file).
 *
 * Transport and decode stay SEPARATED exactly as in the reference: the
 * streaming pipeline (file-source gunzip → from_json → one-long
 * high-watermark state) is identical whether snapshots arrive over HTTP
 * or by file drop, so the q07 oracle and every existing S4 test hold
 * unchanged. The poller is DRIVER-side by design — one tiny conditional
 * GET per 20-min tick (provider.go:179-181), never executor work; align
 * the caller's schedule with the stream's `Trigger.ProcessingTime`.
 *
 * Loopback-proven: ProvidersSpec drives poll → 304 → changed-ETag →
 * stream against an in-JVM HTTP server (the discipline of
 * [[graft.fetch.HttpFetcher]] — this sandbox has no egress).
 */
class FeedPoller(feedUrl: String, feedDir: String, timeoutMs: Long = 5000) {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()

  private var lastEtag: Option[String] = None
  private var seq: Int = 0

  /** The stored validator, exposed for resume bookkeeping (a restarted
    * poller that re-fetches one redundant snapshot is harmless — the
    * stream's watermark dedups — but persisting the ETag avoids even
    * that). */
  def etag: Option[String] = lastEtag

  /**
   * One poll tick. Returns true iff a NEW snapshot file landed in
   * `feedDir`. Non-200/304 statuses and transport errors skip the tick
   * (the reference logs and waits for the next tick, provider.go:183-199
   * — a flaky feed must not kill the crawl).
   */
  def pollOnce(): Boolean = {
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(feedUrl))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("User-Agent", "graft-crawler/0.4")
      .GET()
    lastEtag.foreach(e => b.header("If-None-Match", e))
    val resp =
      try client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      catch { case _: java.io.IOException => return false }
    if (resp.statusCode() != 200) return false // 304 = unchanged; 5xx = skip
    val tag = {
      val t = resp.headers().firstValue("etag")
      if (t.isPresent) Some(t.get) else None
    }
    if (tag.isDefined && tag == lastEtag) return false // server ignored INM
    val bytes = resp.body()
    if (bytes == null || bytes.isEmpty) return false
    lastEtag = tag.orElse(lastEtag)
    val gz = bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte
    val name = f"feed-$seq%06d.json" + (if (gz) ".gz" else "")
    val dir = java.nio.file.Paths.get(feedDir)
    java.nio.file.Files.createDirectories(dir)
    // temp + atomic same-dir rename: the streaming file source must never
    // list a half-written snapshot
    val tmp = dir.resolve(s".tmp-$name")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    seq += 1
    true
  }
}
