package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-cleaning operators — the per-document and cross-document scrub
 * passes a pretraining pipeline runs BEFORE dedup/quality gating:
 *
 *  - C4-style line filtering (Raffel et al. 2020 §2.2: drop lines that are
 *    too short or carry no function words — menus, tag soup, code crumbs);
 *  - PII scrubbing (emails / IPv4s / phone-shaped digit runs replaced by
 *    typed placeholder tokens, with per-doc match counts — the audit trail
 *    a compliance pass needs);
 *  - sentence-level exact dedup across the corpus (RefinedWeb/CCNet-style:
 *    the FIRST occurrence of a sentence survives, every later copy is
 *    counted against its document).
 *
 * The synthetic `documents` table has no newlines or PII, so line/sentence
 * structure is DERIVED deterministically (fixed-size token chunks) and PII
 * is INJECTED deterministically from `doc_id` (the same replay-in-SQL
 * technique as [[Multimodal.mediaFromDocs]]) — which makes every operator
 * here fully hash-verifiable in DuckDB while keeping the Spark-side
 * plumbing (per-row array algebra, one hash-keyed shuffle for the
 * cross-corpus dedup) exactly what a real corpus would run.
 *
 * Scale notes: line filter and PII scrub are pure per-row projections
 * (codegen'd, no shuffle — they ride the scan stage at 100 TB). Sentence
 * dedup shuffles (hash, packed-first-occurrence) pairs once on the
 * sentence hash with map-side partial min — O(total sentences), the same
 * exact-groupBy shape as [[Dedup.exactDedup]], never all-pairs.
 */
object Clean {

  /** Deterministic "sentences": consecutive `chunk`-token windows of the
    * doc's token stream, each joined by single spaces (the last chunk may
    * be shorter). Empty docs yield zero sentences. The token array is
    * bound once (the [[TextOps.shingles]] lesson). */
  def sentenceChunks(toks: Column, chunk: Int): Column =
    element_at(transform(array(toks), t => chunksOf(t, chunk)), 1)

  private def chunksOf(t: Column, chunk: Int): Column =
    when(size(t) > 0,
      transform(
        sequence(lit(0), floor((size(t) - lit(1)) / lit(chunk)).cast("int")),
        i => slice(t, i * lit(chunk) + lit(1), lit(chunk))))
      .otherwise(expr("array()").cast("array<array<string>>"))

  /**
   * C4-style line filter over derived lines of `chunk` tokens: a line is
   * KEPT iff it has ≥ `minWords` tokens AND contains at least one
   * function word ([[TextOps.stopwords]]) — the C4 terminal-punctuation
   * rule is replaced by the stopword rule because the synthetic corpus
   * has no punctuation (the real rule is one extra `endswith` conjunct).
   *
   * Returns per-doc audit columns: `lines_total`, `lines_kept`,
   * `kept_frac` (round 6), and `cleaned_chars` — the length of the
   * surviving text — plus `cleaned_md5` so the oracle verifies the
   * reconstructed text itself, not just the counts.
   */
  def lineFilter(docs: DataFrame, chunk: Int = 12, minWords: Int = 5)
      : DataFrame = {
    val stopArr = array(TextOps.stopwords.map(lit): _*)
    val out = element_at(transform(array(TextOps.tokens(col("text"))), t => {
      val lines = chunksOf(t, chunk)
      val kept = filter(lines, l =>
        size(l) >= minWords &&
          exists(l, w => array_contains(stopArr, w)))
      val cleaned = concat_ws(" ", flatten(kept))
      struct(
        size(lines).cast("long").as("lines_total"),
        size(kept).cast("long").as("lines_kept"),
        round(size(kept).cast("double") /
          greatest(size(lines), lit(1)).cast("double"), 6).as("kept_frac"),
        length(cleaned).cast("long").as("cleaned_chars"),
        md5(cleaned).as("cleaned_md5"))
    }), 1)
    docs.select(col("doc_id"), out.as("o")).select("doc_id", "o.*")
  }

  /**
   * Deterministic synthetic PII injection (sandbox stand-in for a raw
   * crawl): appends an email for `doc_id % 5 = 0`, an IPv4 for
   * `doc_id % 7 = 0`, and a phone-shaped token for `doc_id % 11 = 0`.
   * Pure column algebra over `doc_id`, replayable verbatim in SQL.
   */
  def withSyntheticPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("long")
    docs.withColumn("raw", concat(
      col("text"),
      when(id % 5 === 0,
        concat(lit(" contact u"), id, lit("@example.com"))).otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" from 10."), id % 200, lit(".0."), id % 250))
        .otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" call 555-"), lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(lit(""))))
  }

  /** Scrub patterns — deliberately restricted to the regex subset that
    * means the same thing in Java regex (Spark) and RE2 (DuckDB):
    * character classes, `+`/`{n,}` quantifiers, `\b` word boundaries. */
  val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePat = "\\b[0-9]{3}-[0-9]{4}\\b"

  /**
   * PII scrub of `textCol`: emails → `<EMAIL>`, IPv4s → `<IP>`, phone
   * tokens → `<PHONE>`, applied in that order (an IPv4 inside an email
   * host is consumed by the email rule first — order is part of the
   * contract). Emits per-doc match counts and the md5 + length of the
   * scrubbed text so the oracle checks the replacement itself.
   */
  def piiScrub(docs: DataFrame, textCol: String = "raw"): DataFrame = {
    val t0 = col(textCol)
    val nEmail = regexp_count(t0, lit(emailPat))
    val nIp = regexp_count(t0, lit(ipv4Pat))
    val nPhone = regexp_count(t0, lit(phonePat))
    val s1 = regexp_replace(t0, emailPat, "<EMAIL>")
    val s2 = regexp_replace(s1, ipv4Pat, "<IP>")
    val s3 = regexp_replace(s2, phonePat, "<PHONE>")
    docs.select(col("doc_id"),
      nEmail.cast("long").as("n_email"),
      nIp.cast("long").as("n_ip"),
      nPhone.cast("long").as("n_phone"),
      length(s3).cast("long").as("scrub_len"),
      md5(s3).as("scrub_md5"))
  }

  /**
   * Cross-corpus sentence-level exact dedup: every derived sentence is
   * hashed; the globally FIRST occurrence (min packed `(doc_id, pos)`)
   * survives, later copies count as duplicates against their doc.
   * Returns per-doc `n_sent`, `n_dup`, `dup_frac` (round 6).
   *
   * Shape at 100 TB: explode → groupBy(sentence hash) with a PACKED
   * first-occurrence key (`doc_key * 2^20 + pos` — a single long min
   * with map-side combine; the min of the pack IS the lexicographic min
   * of the pair because pos < 2^20 per doc, asserted below) → one
   * shuffle back on the hash to flag copies → per-doc re-aggregation.
   * Two exchanges total, both O(sentences); no window, no all-pairs.
   * The same packed-priority trick as the frontier merge
   * ([[graft.frontier.Frontier]]) — a struct-min would carry the full
   * struct through the shuffle; the packed long is 8 bytes.
   *
   * `docKey` maps doc_id into a dense long (identity for the synthetic
   * corpus). 2^43 doc keys × 2^20 positions fit a long; the pos bound is
   * enforced with a `raise_error`-backed runtime guard below — a silent
   * pass-through on overflow would corrupt the packed min and
   * mis-attribute duplicates (a ≥2^20-sentence doc is ~10M tokens at
   * chunk=10: rare, but the failure must be loud, not wrong).
   */
  def sentenceDedup(docs: DataFrame, chunk: Int = 10): DataFrame = {
    val posChecked = when(col("pos") < lit(1 << 20), col("pos"))
      .otherwise(raise_error(concat(
        lit("sentenceDedup: sentence position overflows the 2^20 pack bound: "),
        col("pos").cast("string"))))
    val sents = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        posexplode(sentenceChunks(TextOps.tokens(col("text")), chunk))
          .as(Seq("pos", "sent_toks")))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", col("sent_toks"))).as("h"),
        (col("doc_id") * lit(1L << 20) + posChecked).as("packed"))
    val first = sents.groupBy("h").agg(min("packed").as("first_packed"))
    sents.join(first, Seq("h"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_sent"),
        sum(when(col("packed") =!= col("first_packed"), 1L).otherwise(0L))
          .as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_sent").cast("double"), 6))
  }
}
