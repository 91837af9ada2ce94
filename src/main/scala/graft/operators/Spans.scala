package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Operators over the interleaved text+media SPAN shape — the engine's
 * native document model (`Model.Span`: kind, text, media_ref, offset;
 * the crawl pipeline emits kraaler session bodies as ordered span arrays,
 * worker.go:989-1019 → `Correlate.docFromSession`). The north rule's
 * per-row invariant is span-SEQUENCE equality (kind, text, media_ref,
 * order), so the core operator here materializes a deterministic
 * sequence fingerprint: two docs' span sequences are equal iff their
 * fingerprints are (md5 over the in-order fold of every span's identity).
 *
 * Scale notes: everything is per-row column algebra over the spans array
 * — no explode, no shuffle; the sequence fold reads the array IN ORDER
 * (array order is the span order — no window, no sort, and none of the
 * collect_list ordering hazards an exploded formulation would have).
 * All folds bind the array once (the [[TextOps.shingles]] lesson) and
 * every formula is replayable in DuckDB SQL (SparkEntry q38).
 */
object Spans {

  /**
   * Deterministic interleaved span documents derived from the plain-text
   * `documents` table (the sandbox stand-in for real crawl output — same
   * technique as [[Multimodal.mediaFromDocs]]): tokens are chunked 8 per
   * span, every third span is a media span whose ref is md5-derived from
   * (doc_id, span index), the rest carry the chunk text. Offsets are the
   * span indices — the order the invariant protects.
   */
  def spansFromDocs(docs: DataFrame, tokensPerSpan: Int = 8,
      mediaEvery: Int = 3): DataFrame = {
    val spans = element_at(transform(array(TextOps.tokens(col("text"))), t => {
      val nChunks = floor((size(t) + lit(tokensPerSpan - 1)) / lit(tokensPerSpan))
        .cast("int")
      transform(sequence(lit(0), greatest(nChunks, lit(1)) - lit(1)), i => {
        val isMedia = pmod(i, lit(mediaEvery)) === lit(mediaEvery - 1)
        struct(
          when(isMedia, lit("media")).otherwise(lit("text")).as("kind"),
          when(isMedia, lit(null).cast("string"))
            .otherwise(concat_ws(" ", slice(t, i * tokensPerSpan + 1, lit(tokensPerSpan))))
            .as("text"),
          when(isMedia,
            concat(lit("m/"), md5(concat(col("doc_id").cast("string"), lit(":"), i))))
            .otherwise(lit(null).cast("string")).as("media_ref"),
          i.as("offset"))
      })
    }), 1)
    docs.select(col("doc_id"), spans.as("spans"))
  }

  /** One span's identity string inside the sequence fold:
    * `kind:payload` where payload is the text for text spans and the
    * media_ref for media spans. */
  private def spanIdent(s: Column): Column =
    concat(s.getField("kind"), lit(":"),
      coalesce(s.getField("text"), s.getField("media_ref"), lit("")))

  /**
   * Per-document span-sequence statistics + the SEQUENCE FINGERPRINT:
   * md5 over the in-order '|'-joined span identities. Two documents have
   * equal (kind, text, media_ref, order) sequences iff `seq_hash` is
   * equal — the north rule's per-row invariant as a comparable column
   * (the crawl correctness suite asserts it row-by-row against the
   * simulator; this operator makes it a corpus-level artifact any two
   * stores can be diffed on).
   */
  def spanSeqStats(spanDocs: DataFrame): DataFrame = {
    val sp = col("spans")
    spanDocs.select(
      col("doc_id"),
      size(sp).cast("long").as("n_spans"),
      size(filter(sp, s => s.getField("kind") === "media")).cast("long").as("n_media"),
      coalesce(aggregate(sp, lit(0L),
        (acc, s) => acc + coalesce(length(s.getField("text")).cast("long"), lit(0L))),
        lit(0L)).as("text_chars"),
      md5(aggregate(sp, lit("").cast("string"),
        (acc, s) => concat(acc, spanIdent(s), lit("|")))).as("seq_hash"))
  }
}
