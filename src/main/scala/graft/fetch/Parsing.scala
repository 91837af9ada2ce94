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

  def looksLikeHtml(body: String): Boolean =
    body != null && UrlFns.sniffMime(
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8)) == "text/html"

  /** Extract + filter + resolve + dedup hrefs from an html body. */
  def retrieveLinks(baseUrl: String, body: String): Seq[String] = {
    if (!looksLikeHtml(body)) return Seq.empty
    val m = hrefRe.matcher(body)
    val out = new java.util.LinkedHashSet[String]()
    while (m.find()) {
      val resolved = UrlFns.resolveUrl(baseUrl, m.group(1))
      if (resolved != null) out.add(resolved)
    }
    import scala.jdk.CollectionConverters._
    out.asScala.toSeq
  }
}
