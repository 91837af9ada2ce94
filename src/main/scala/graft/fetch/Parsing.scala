package graft.fetch

import graft.functions.UrlFns

/**
 * Link extraction — the frontier-expansion parser.
 *
 * Mirrors the TESTED semantics of the reference (`RetrieveLinks`,
 * /root/reference/parsing.go:13-92, fixtures parsing_test.go:10-67):
 *  - only applied when the sniffed content type is html (parsing.go:13-15);
 *  - anchors' href attributes only (goquery `a[href]`, parsing.go:59-68);
 *  - keep-filter `^/[a-zA-Z]+|^http://|^https://` (parsing.go:46);
 *  - dedup preserving first-seen order (set at parsing.go:51,72);
 *  - relative hrefs resolved against the page's scheme+host
 *    (parsing.go:78-86).
 */
object Parsing {

  private val hrefRe =
    java.util.regex.Pattern.compile("(?is)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']")

  def looksLikeHtml(body: String): Boolean = {
    if (body == null) return false
    // the sniff reads at most 512 BYTES — encode only that prefix instead
    // of re-materializing the whole body (a second full-body allocation on
    // every fetched page). A multi-byte char straddling the boundary only
    // ADDS bytes past 512, which the sniff ignores — identical result.
    val prefix = if (body.length > 512) body.substring(0, 512) else body
    UrlFns.sniffMime(
      prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == "text/html"
  }

  /** Extract + filter + resolve + dedup hrefs from an html body. The
    * page's base URL is parsed ONCE ([[UrlFns.originOf]]) — not once per
    * href, which cost a `java.net.URI` parse per anchor (≈ links-per-page
    * × fetched-pages parses per crawl round). */
  def retrieveLinks(baseUrl: String, body: String): Seq[String] = {
    if (!looksLikeHtml(body)) return Seq.empty
    val m = hrefRe.matcher(body)
    val out = new java.util.LinkedHashSet[String]()
    var origin: String = null
    var originComputed = false
    while (m.find()) {
      val href = m.group(1)
      if (UrlFns.isKeepableHref(href)) {
        if (href.startsWith("http://") || href.startsWith("https://")) { out.add(href): Unit }
        else {
          if (!originComputed) { origin = UrlFns.originOf(baseUrl); originComputed = true }
          if (origin != null) out.add(origin + href): Unit
        }
      }
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }
}
