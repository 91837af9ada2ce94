package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level curation operators: repetition stats, decontamination,
  * stratified sampling, TF-IDF keywords (SparkEntry q34-q37). */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetitionStats: looping phrase and copy-paste spans are flagged") {
    // A: "x y" loops — top 2-gram 'x y' fills 4/7 slots; every 5-gram
    // occurs twice → dup5_frac 1.0. B: all tokens distinct → nothing dup.
    val docs = Seq(
      10L -> "x y x y x y x y",
      11L -> "a b c d e f g h i j").toDF("doc_id", "text")
    val m = Corpus.repetitionStats(docs, maxFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(m(10L) == ((math.rint(4.0 / 7 * 1e6) / 1e6, 1.0, true)))
    assert(m(11L) == ((math.rint(1.0 / 9 * 1e6) / 1e6, 0.0, false)))
  }

  test("repetitionStats: short docs fall back to the whole-doc gram") {
    // 3 tokens < 5 → the 5-gram side is the single whole-doc gram
    // (total 1, dup 0); 2-gram side is real (2 distinct grams)
    val docs = Seq(20L -> "p q r").toDF("doc_id", "text")
    val r = Corpus.repetitionStats(docs).collect().head
    assert(r.getDouble(1) == 0.5 && r.getDouble(2) == 0.0)
  }

  test("decontaminate counts distinct shared n-grams, clean docs absent") {
    val eval = Seq(7L -> "one two three four five six seven eight tail")
      .toDF("doc_id", "text")
    val train = Seq(
      1L -> "intro one two three four five six seven eight outro",
      2L -> "completely unrelated words with no overlap at all here")
      .toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, eval, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L)) // shares exactly the one 8-gram
  }

  test("decontaminate broadcasts the eval gram dim") {
    val docs = Seq(1L -> "a b c d e f g h i", 7L -> "a b c d e f g h j")
      .toDF("doc_id", "text")
    val plan = Corpus.decontaminate(docs, docs, n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("stratifiedSample: exact quota per stratum, deterministic draw") {
    val docs = (0L until 50L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val s1 = Corpus.stratifiedSample(docs, "lang", k = 3).collect()
    assert(s1.length == 6)
    assert(s1.groupBy(_.getString(0)).forall(_._2.length == 3))
    assert(s1.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 3))
    // replay: identical draw (seeded hash, no wall-clock anywhere)
    val s2 = Corpus.stratifiedSample(docs, "lang", k = 3).collect()
    assert(s1.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
    // small stratum: quota clips to the stratum size
    val tiny = docs.filter(col("doc_id") < 3)
    assert(Corpus.stratifiedSample(tiny, "lang", k = 10).count() == 3)
  }

  test("tfidfTopK ranks by tf·idf and drops everywhere-tokens") {
    val docs = Seq(
      1L -> "common apple apple banana",
      2L -> "common banana cherry",
      3L -> "common cherry durian durian durian").toDF("doc_id", "text")
    val out = Corpus.tfidfTopK(docs, k = 3, nDocs = 3)
    val rows = out.collect()
    // 'common' is in every doc → idf 0 → never emitted
    assert(!rows.exists(_.getString(1) == "common"))
    val top = rows.filter(_.getInt(5) == 1)
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple tf=2 df=1 → 2·ln3 beats banana 1·ln1.5
    // doc 3: durian tf=3 df=1 is the clear keyword
    assert(top(1L) == "apple" && top(3L) == "durian")
    // df dim joins via broadcast (vocabulary ≪ corpus)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
