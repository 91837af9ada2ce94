package graft

import graft.operators.Spans
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interleaved-span operators: deterministic span construction and the
  * span-sequence fingerprint (north-rule per-row invariant as a column). */
class SpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("spansFromDocs: 8-token chunks, every 3rd span media, offsets ordered") {
    // 20 tokens -> 3 spans: text(0), text(1), media(2)
    val docs = Seq((5L, (1 to 20).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Spans.spansFromDocs(docs).select(explode(col("spans")).as("s"))
      .select("s.kind", "s.text", "s.media_ref", "s.offset").collect()
    assert(spans.map(_.getInt(3)).toSeq == Seq(0, 1, 2))
    assert(spans.map(_.getString(0)).toSeq == Seq("text", "text", "media"))
    assert(spans(0).getString(1) == (1 to 8).map(i => s"w$i").mkString(" "))
    assert(spans(1).getString(1) == (9 to 16).map(i => s"w$i").mkString(" "))
    assert(spans(2).getString(1) == null &&
      spans(2).getString(2).startsWith("m/"))
  }

  test("seq_hash: equal iff (kind, payload, order) sequences are equal") {
    def stats(rows: Seq[(Long, Seq[(String, String, String, Int)])]) = {
      val df = rows.toDF("doc_id", "raw")
        .select(col("doc_id"), expr(
          "transform(raw, r -> named_struct('kind', r._1, 'text', r._2, " +
            "'media_ref', r._3, 'offset', r._4))").as("spans"))
      Spans.spanSeqStats(df).collect()
        .map(r => r.getLong(0) -> r.getString(4)).toMap
    }
    val a = Seq(("text", "hello world", null, 0), ("media", null, "m/abc", 1))
    val swapped = Seq(("media", null, "m/abc", 0), ("text", "hello world", null, 1))
    val otherRef = Seq(("text", "hello world", null, 0), ("media", null, "m/XYZ", 1))
    val m = stats(Seq(1L -> a, 2L -> a, 3L -> swapped, 4L -> otherRef))
    assert(m(1L) == m(2L))               // identical sequences agree
    assert(m(1L) != m(3L))               // order matters
    assert(m(1L) != m(4L))               // media_ref matters
  }

  test("spanSeqStats counts: media spans carry no text chars") {
    val docs = Seq((9L, (1 to 24).map(i => s"t$i").mkString(" "))) // 3 spans
      .toDF("doc_id", "text")
    val r = Spans.spanSeqStats(Spans.spansFromDocs(docs)).collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 1) // n_spans, n_media
    val expectedChars =
      (1 to 8).map(i => s"t$i").mkString(" ").length +
        (9 to 16).map(i => s"t$i").mkString(" ").length
    assert(r.getLong(3) == expectedChars)
  }

  test("short doc: single text span, never zero spans") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = Spans.spanSeqStats(Spans.spansFromDocs(docs)).collect().head
    assert(r.getLong(1) == 1 && r.getLong(2) == 0 && r.getLong(3) == 5)
  }
}
