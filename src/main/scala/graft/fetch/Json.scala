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
}
