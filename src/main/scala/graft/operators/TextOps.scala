package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for a large-scale training-data pipeline:
 * tokenization, token counting, language ID (n-gram/function-word
 * heuristic), quality scoring, and document fingerprinting.
 *
 * All of these are pure `org.apache.spark.sql.functions` compositions —
 * whole-stage-codegen'd, no UDFs — and each is defined so the SAME formula
 * is expressible in ANSI-ish SQL (the DuckDB oracle). The only non-SQL
 * member is the winnowing fingerprint, which is a deterministic Scala
 * function exposed for mapPartitions use (rows-only verified).
 *
 * Scale notes: every function here is a narrow per-row projection — no
 * shuffle, no state; they vectorize inside the scan stage at 100 TB.
 */
object TextOps {

  /** Whitespace tokens of lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * punctuation runs each count as one token (a cheap stand-in for a BPE
    * pre-tokenizer's word splitter). */
  val bpeTokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenRegex))

  // ---- language ID: function-word profile heuristic ----

  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "je", "pas", "pour", "que", "une"),
    "es" -> Seq("el", "los", "las", "es", "no", "por", "una", "para", "con", "su"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Best-profile language, 'und' when nothing matches. Ties resolve in
    * profile order (en > de > fr > es) — deterministic.
    *
    * The token array is BOUND once (the [[shingles]] lesson): the CASE
    * cascade references each profile's hit count ~2× and `greatest` all
    * of them again — an unbound form re-tokenized the text ~9× per row. */
  def langId(text: Column): Column =
    element_at(transform(array(tokens(text)), t => langIdOf(t)), 1)

  private def langIdOf(toks: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> hits(toks, ws) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  // ---- quality scoring ----

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "this", "be", "are")

  /** Composite [0,1] quality score: length credit + stopword-ratio credit +
    * punctuation-excess penalty. Formula chosen to be engine-portable
    * (round(…,6) so double math matches across engines). */
  def qualityScore(text: Column): Column =
    element_at(transform(array(tokens(text)),
      t => qualityScoreOf(t, text)), 1)

  private def qualityScoreOf(toks: Column, text: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = hits(toks, stopwords).cast("double") / greatest(nTok, lit(1.0))
    val punct = regexp_count(text, lit("[,.!?;:]")).cast("double")
    val punctRatio = punct / greatest(length(text).cast("double"), lit(1.0))
    round(
      lit(0.3) * least(nTok / lit(100.0), lit(1.0)) +
        lit(0.4) * stopRatio +
        lit(0.3) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))),
      6)
  }

  // ---- fingerprinting ----

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercased text
    * (portable: DuckDB md5 produces identical hex). */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Token n-gram shingles: contiguous n-token windows joined by ' '.
    *
    * The `toks` argument is BOUND to a lambda variable before the per-gram
    * transform: a lambda body that referenced the `toks` expression tree
    * directly would re-evaluate it for EVERY gram — when callers pass
    * `tokens(text)` (a regex split) that is O(tokens²) regex work per row
    * plus per-gram array churn (measured: 10-100× on the shingle-explode
    * stage). `transform(array(toks), t => …)` evaluates `toks` once per
    * row and every inner reference is an O(1) variable read — one
    * expression, no caller-side projection staging required. */
  def shingles(toks: Column, n: Int): Column =
    element_at(transform(array(toks), t => shinglesOf(t, n)), 1)

  /** Shingles over an ALREADY-BOUND token array (lambda var or column). */
  private def shinglesOf(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))

  /**
   * Winnowing rolling-hash fingerprint (Schleimer et al., SIGMOD'03):
   * k-gram Karp-Rabin hashes, window-min selection → the doc's sketch.
   * Deterministic pure Scala for mapPartitions / typed use.
   *
   * All hash arithmetic is mod 2^61 (a single mask per step — 2^61 divides
   * 2^64, so Java's wrap-around long arithmetic projects exactly onto it).
   * Chosen over raw 64-bit wrap so the SAME polynomial is computable in
   * 128-bit integer SQL: the DuckDB oracle recomputes every k-gram hash,
   * window min, and the distinct sketch set (q31 is hash-verified, not
   * rows-only).
   */
  val winnowMask: Long = (1L << 61) - 1
  val winnowBase: Long = 1000000007L

  def winnow(text: String, k: Int = 5, window: Int = 4): Seq[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    val B = winnowBase
    if (s.length < k) return if (s.isEmpty) Seq.empty else Seq(karpRabin(s))
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = (h * B + s.charAt(i)) & winnowMask
      if (i < k - 1) pow = (pow * B) & winnowMask
      i += 1
    }
    hashes(0) = h
    i = k
    while (i < s.length) {
      h = ((h - s.charAt(i - k) * pow) * B + s.charAt(i)) & winnowMask
      hashes(i - k + 1) = h
      i += 1
    }
    // window-min selection, rightmost-min rule
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var w = 0
    while (w + window <= hashes.length) {
      var mi = w
      var j = w + 1
      while (j < w + window) { if (hashes(j) <= hashes(mi)) mi = j; j += 1 }
      out += hashes(mi)
      w += 1
    }
    if (out.isEmpty) Seq(hashes.min) else out.toSeq
  }

  private def karpRabin(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * winnowBase + s.charAt(i)) & winnowMask; i += 1 }
    h
  }
}
