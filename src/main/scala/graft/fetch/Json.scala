package graft.fetch

/**
 * Minimal deterministic JSON renderer for span payloads. Map keys are
 * emitted in sorted order so the same logical payload always renders to
 * byte-identical text — required for the per-row span-sequence equality
 * invariant (BASELINE.json `input_hint`) and content-addressed dedup.
 */
object Json {
  def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => esc(k) + ":" + v }.mkString("{", ",", "}")

  def str(s: String): String = if (s == null) "null" else esc(s)
  def num(n: Long): String = n.toString
  def num(n: Double): String =
    if (n == math.floor(n) && !n.isInfinite) n.toLong.toString else n.toString
  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")

  /** String map rendered with sorted keys (headers are Go maps — unordered
    * in the reference; sorting is our determinism choice). */
  def sortedMap(m: Map[String, String]): String =
    obj(m.toSeq.sortBy(_._1).map { case (k, v) => (k, str(v)) }: _*)

  // ---- appending forms (fetch hot path) ----
  // The combinator forms above are the byte-level SPECIFICATION; the
  // appending forms below render the same bytes into a caller-owned
  // StringBuilder in one pass. The combinators allocate an intermediate
  // String per field plus a copy per nesting level — measured at ~10% of
  // total bench CPU and ~25% of all allocation at local[32], almost all
  // of it re-copying page bodies through esc→concat→obj. Equivalence is
  // property-tested (FetchCorrelateSpec, JsonSpec escape cases).

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Append the quoted, escaped form of `s` — byte-identical to [[esc]].
    * Bulk-appends the runs between escape-needing chars, so an
    * escape-free body costs one arraycopy instead of a per-char lambda. */
  def escTo(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    val n = s.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') {
        sb.append(s, start, i)
        if (c == '"') sb.append("\\\"")
        else if (c == '\\') sb.append("\\\\")
        else if (c == '\n') sb.append("\\n")
        else if (c == '\r') sb.append("\\r")
        else if (c == '\t') sb.append("\\t")
        else {
          // c < 0x20 here, so %04x always renders as 00 + two hex digits
          sb.append("\\u00")
          sb.append(HexDigits((c >> 4) & 0xf))
          sb.append(HexDigits(c.toInt & 0xf))
        }
        start = i + 1
      }
      i += 1
    }
    sb.append(s, start, n)
    sb.append('"')
  }

  /** Appending [[str]]: bare `null` for null, else quoted-escaped. */
  def strTo(sb: java.lang.StringBuilder, s: String): Unit =
    if (s == null) sb.append("null") else escTo(sb, s)

  /** Appending [[sortedMap]]: sorted keys, zero tuple/Seq garbage.
    * `java.util.Arrays.sort` on String uses compareTo — the same
    * lexicographic order as the specification's `sortBy(_._1)`. */
  def sortedMapTo(sb: java.lang.StringBuilder, m: Map[String, String]): Unit = {
    sb.append('{')
    if (m.nonEmpty) {
      val ks = m.keysIterator.toArray
      java.util.Arrays.sort(ks.asInstanceOf[Array[Object]])
      var i = 0
      while (i < ks.length) {
        if (i > 0) sb.append(',')
        escTo(sb, ks(i))
        sb.append(':')
        strTo(sb, m(ks(i)))
        i += 1
      }
    }
    sb.append('}')
  }
}
