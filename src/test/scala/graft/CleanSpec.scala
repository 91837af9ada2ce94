package graft

import graft.operators.{Clean, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-cleaning operators: C4-style line filter, PII scrub,
  * sentence-level exact dedup (SparkEntry q39-q41). */
class CleanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sentenceChunks splits the token stream into fixed windows") {
    val df = Seq("a b c d e f g", "a b", "").toDF("text")
      .select(Clean.sentenceChunks(TextOps.tokens(col("text")), 3).as("s"))
    val got = df.collect().map(
      _.getSeq[scala.collection.Seq[String]](0).map(_.mkString(" ")).toSeq)
    assert(got(0) == Seq("a b c", "d e f", "g")) // last chunk shorter
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq.empty)                  // empty doc → no sentences
  }

  test("lineFilter keeps only long-enough lines that carry a stopword") {
    // chunk=4, minWords=3: line1 "the x y z" kept (4 words, has 'the');
    // line2 "p q r s" dropped (no stopword); line3 "the t" dropped (<3).
    val docs = Seq(1L -> "the x y z p q r s the t").toDF("doc_id", "text")
    val r = Clean.lineFilter(docs, chunk = 4, minWords = 3).collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 1)         // total, kept
    // HALF_UP like the operator/oracle (1/3 has no .5 tie, but the helper
    // must encode the same rounding rule as the code under test)
    assert(r.getDouble(3) == BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(4) == "the x y z".length)
    // the reconstructed-text hash matches the surviving line exactly
    val want = Seq("the x y z").mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(5) == md)
  }

  test("lineFilter on an empty doc reports zero lines, frac 0") {
    val r = Clean.lineFilter(Seq(1L -> "  ").toDF("doc_id", "text"))
      .collect().head
    assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getDouble(3) == 0.0)
  }

  test("piiScrub replaces and counts emails, IPs, phones in rule order") {
    val docs = Seq(
      (1L, "mail a.b+c@host.co now"),
      (2L, "srv 10.1.2.3 and 192.168.0.1 up"),
      (3L, "call 555-0199 or 555-0200"),
      (4L, "clean text only"),
      // IPv4-shaped host inside an email is consumed by the email rule
      (5L, "x u@10.1.2.3.com y")).toDF("doc_id", "raw")
    val m = Clean.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 1 && m(1L).getLong(2) == 0)
    assert(m(2L).getLong(2) == 2)
    assert(m(3L).getLong(3) == 2)
    assert(m(4L).getLong(1) + m(4L).getLong(2) + m(4L).getLong(3) == 0)
    assert(m(5L).getLong(1) == 1)
    // scrub really rewrote the text: "mail <EMAIL> now"
    assert(m(1L).getLong(4) == "mail <EMAIL> now".length)
  }

  test("withSyntheticPii is deterministic and only fires on its residues") {
    val docs = Seq(35L -> "base", 1L -> "base").toDF("doc_id", "text")
    val raw = Clean.withSyntheticPii(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(raw(35L) == "base contact u35@example.com from 10.35.0.35")
    assert(raw(1L) == "base")
  }

  test("sentenceDedup counts later copies, first occurrence survives") {
    // chunk=2 sentences: doc1 = [a b][c d][a b] → pos2 dups pos0;
    // doc2 = [a b][x y] → its [a b] dups doc1's. First-by-(doc,pos) wins.
    val docs = Seq(1L -> "a b c d a b", 2L -> "a b x y").toDF("doc_id", "text")
    val m = Clean.sentenceDedup(docs, chunk = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // HALF_UP, matching Spark's round() (not math.rint's half-even)
    assert(m(1L) == ((3L, 1L, BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m(2L) == ((2L, 1L, 0.5)))
  }

  test("sentenceDedup plan: two exchanges, no window, no cartesian") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b").toDF("doc_id", "text")
    val plan = Clean.sentenceDedup(docs, chunk = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Cartesian"))
  }

  test("sentenceDedup raises loudly when pos overflows the 2^20 pack bound") {
    // chunk=1 over 2^20+1 tokens drives the max sentence position to
    // 2^20 — past the pack bound. A silent pass-through would corrupt
    // the packed first-occurrence min; the guard must throw instead.
    val docs = Seq(1L -> Seq.fill((1 << 20) + 1)("a").mkString(" "))
      .toDF("doc_id", "text")
    // NOT .count(): column pruning would strip the packed column (and
    // the guard with it) from a row-count-only plan — evaluate a column
    // that genuinely depends on the pack
    val e = intercept[Exception] {
      Clean.sentenceDedup(docs, chunk = 1).select("n_dup").collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(msgs.contains("overflows the 2^20 pack bound"), msgs.take(2000))
  }
}
