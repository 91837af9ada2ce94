package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Recrawl

/** Driver-replay + invariant tests for the recrawl change-rate
  * scheduler (q59). The DuckDB oracle hash-verifies the full synthetic
  * pipeline; these pin the estimator semantics on hand-built visit logs
  * where the expected λ̂ is checkable by hand. */
class RecrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lam(n: Long, x: Long): Long =
    BigDecimal(-math.log(((n - x) * 2 + 1).toDouble / (n * 2 + 1).toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("changeRatePriorities: λ̂ matches the bias-reduced form; edge cases finite") {
    // doc 1: a a b b  → 1 change / 3 intervals
    // doc 2: a b c d  → 3 changes / 3 intervals (X = n stays finite)
    // doc 3: a a a a  → 0 changes (λ̂ exactly 0)
    val visits = Seq(
      (1L, 0, "a"), (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "b"),
      (2L, 0, "a"), (2L, 1, "b"), (2L, 2, "c"), (2L, 3, "d"),
      (3L, 0, "a"), (3L, 1, "a"), (3L, 2, "a"), (3L, 3, "a"))
      .toDF("doc_id", "r", "content_hash")
    val got = Recrawl.changeRatePriorities(visits, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = Seq(
      (2L, 3L, 3L, lam(3, 3), 1L), // hottest first
      (1L, 3L, 1L, lam(3, 1), 2L),
      (3L, 3L, 0L, 0L, 3L))
    assert(got.toSeq == want)
    assert(lam(3, 3) > lam(3, 1) && lam(3, 1) > 0L)
  }

  test("syntheticVisits: version bumps exactly on planted change draws") {
    val docs = (0L until 20L).toDF("doc_id")
      .withColumn("text", lit("x"))
    val vis = Recrawl.syntheticVisits(docs, visits = 6)
    assert(vis.count() == 20L * 6)
    // hash changes between r and r+1 ⇔ the planted draw fired: replay one doc
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def draw(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val id = 7L
    val rate = 5 + (draw(s"rate:$id") % 60)
    val versions = (0 until 6).scanLeft(0L) { case (v, r) =>
      if (r >= 1 && draw(s"chg:$id:$r") % 100 < rate) v + 1 else v
    }.tail // scanLeft seeds with r = -1; visits are r = 0..5
    val wantHashes = (0 until 6).map(r => md5hex(s"body:$id:${versions(r)}"))
    val gotHashes = vis.filter($"doc_id" === id).orderBy("r")
      .collect().map(_.getString(2)).toSeq
    assert(gotHashes == wantHashes)
  }

  test("recrawl pick plans as a distributed take, aggregate map-side combines") {
    // k must be < the provable row bound: with a tiny LocalRelation and
    // k ≥ maxRows, EliminateLimits drops the limit and no take appears
    val visits = (0L until 10L).flatMap(d =>
      Seq((d, 0, "a"), (d, 1, s"b$d"))).toDF("doc_id", "r", "content_hash")
    val plan = Recrawl.changeRatePriorities(visits, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"recrawl top-k is not a distributed take:\n$plan")
    // the per-URL (n, X) aggregate keeps its map-side combine
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"change-count aggregate lost its partial phase:\n$plan")
  }
}
