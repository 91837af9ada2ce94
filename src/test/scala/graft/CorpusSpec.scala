package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level curation operators: repetition stats, decontamination,
  * stratified sampling, TF-IDF keywords (SparkEntry q34-q37). */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Expected-value rounding MUST mirror Spark's round() (HALF_UP over the
  // decimal string form), not math.rint (half-even) — the operators and
  // the DuckDB oracles both use HALF_UP, and a helper encoding a
  // different rule only passes while the constants dodge exact .5 ties.
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def microHU(x: Double): Long =
    BigDecimal(1e6 * x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("repetitionStats: looping phrase and copy-paste spans are flagged") {
    // A: "x y" loops — top 2-gram 'x y' fills 4/7 slots; every 5-gram
    // occurs twice → dup5_frac 1.0. B: all tokens distinct → nothing dup.
    val docs = Seq(
      10L -> "x y x y x y x y",
      11L -> "a b c d e f g h i j").toDF("doc_id", "text")
    val m = Corpus.repetitionStats(docs, maxFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(m(10L) == ((r6(4.0 / 7), 1.0, true)))
    assert(m(11L) == ((r6(1.0 / 9), 0.0, false)))
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

  test("domainMixture: √-flattened weights from exact integer token shares") {
    // s1 holds 4 of 16 tokens, s2 the other 12 — shares 1/4 and 3/4;
    // α=1/2 flattening upweights the rare domain (0.25 → ~0.366)
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d", "s1"),
      (3L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Corpus.domainMixture(docs).orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val sMicro = Seq(4.0 / 16, 12.0 / 16).map(s => microHU(math.sqrt(s)))
    val denom = sMicro.sum // integer normalization — no float-sum order
    def w(s: Long): Long =
      BigDecimal(s * 1e6 / denom).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(got.toSeq == Seq(
      ("s1", 2L, 4L, 250000L, w(sMicro(0))),
      ("s2", 1L, 12L, 750000L, w(sMicro(1)))))
    // the flattened weights still sum to ~1e6 and invert the skew ordering
    assert(math.abs(got.map(_._5).sum - 1000000L) <= 1)
    assert(got(0)._5 > got(0)._4 && got(1)._5 < got(1)._4)
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

  test("packSequences: prefix-sum packing matches the sequential oracle") {
    // order is by md5('pack:42:'||id) — recompute it here and replay the
    // concatenate-then-chunk packing sequentially
    val docs = Seq(
      1L -> "a b c", 2L -> "d e f g h", 3L -> "", 4L -> "i j",
      5L -> ("w " * 700).trim).toDF("doc_id", "text")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lens = Map(1L -> 3L, 2L -> 5L, 3L -> 0L, 4L -> 2L, 5L -> 700L)
    val order = lens.keys.toSeq.sortBy(id => (md5hex(s"pack:42:$id"), id))
    val cap = 512
    var run = 0L
    val want = order.map { id =>
      val len = lens(id)
      val first = run / cap
      val last = if (len > 0) (run + len - 1) / cap else first
      val r = (id, len, first, last, if (len > 0) last - first + 1 else 0L, run % cap)
      run += len
      r
    }.sortBy(_._1)
    val got = Corpus.packSequences(docs, cap = cap).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // doc 5 (700 tokens) must span 2+ sequences somewhere in the layout
    assert(got.find(_._1 == 5L).get._5 >= 2)
  }

  test("packSequences output is independent of the partition count") {
    val docs = (1L to 50L).map(i => i -> ("t " * (i % 7).toInt).trim)
      .toDF("doc_id", "text")
    val a = Corpus.packSequences(docs, cap = 10, parts = 1)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Corpus.packSequences(docs, cap = 10, parts = 7)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("packSequences over a multi-file scan matches the sequential oracle at every P") {
    // Regression for the unpersist-before-consume corruption: offsets
    // were computed on the CACHED range layout, but a caller evaluating
    // the lazy result after the unpersist re-ran the range exchange —
    // over a MULTI-SPLIT file scan its re-sampled boundaries can differ,
    // silently misaligning offsets against data. A LocalRelation never
    // triggers it; a several-file parquet scan does (observed at sf0.1).
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    val n = 800
    (0 until n).map(i => (i.toLong, ("w " * (i % 23)).trim))
      .toDF("doc_id", "text")
      .repartition(6) // several parquet files → multi-split scan
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    // sequential oracle over the (md5 draw, doc_id) total order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lens = (0 until n).map(i => i.toLong -> (i % 23).toLong).toMap
    val order = lens.keys.toSeq.sortBy(id => (md5hex(s"pack:42:$id"), id))
    val cap = 64
    var run = 0L
    val want = order.map { id =>
      val len = lens(id)
      val first = run / cap
      val last = if (len > 0) (run + len - 1) / cap else first
      val r = (id, len, first, last, if (len > 0) last - first + 1 else 0L, run % cap)
      run += len
      r
    }.sortBy(_._1)
    for (p <- Seq(3, 8, 13)) {
      val got = Corpus.packSequences(scan, cap = cap, parts = p)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got == want, s"packing diverged from the sequential oracle at parts=$p")
    }
  }

  test("termFreqQuality: integer corpus counts, OOV fraction, empty docs") {
    val docs = Seq(
      1L -> "the the cat", // the:3(corpus), cat:1
      2L -> "the zzqx",    // zzqx is a singleton → OOV at minCount=2
      3L -> "").toDF("doc_id", "text")
    val m = Corpus.termFreqQuality(docs, minCount = 2L).collect()
      .map(r => r.getLong(0) -> r).toMap
    // corpus counts: the=3, cat=1, zzqx=1
    assert(m(1L).getLong(1) == 3 && m(1L).getLong(2) == 3 + 3 + 1)
    assert(m(1L).getDouble(3) == r6(7.0 / 3))
    assert(m(1L).getDouble(4) == r6(1.0 / 3))
    assert(m(2L).getLong(2) == 3 + 1 &&
      m(2L).getDouble(4) == 0.5) // zzqx OOV, the not
    assert(m(3L).getLong(1) == 0 && m(3L).isNullAt(3) && m(3L).isNullAt(4))
  }

  test("dsirSample: target-like docs outscore off-domain docs; weights are exact") {
    // target speaks "alpha beta gamma"; raw doc 1 speaks target-ese, raw
    // docs 2-9 speak a disjoint vocabulary. With k=3 the in-domain doc
    // must survive the Gumbel draw (its weight dwarfs the noise).
    val target = (100L until 110L).map(i => (i, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    val raw = ((1L, "alpha beta gamma alpha beta gamma") +:
      (2L until 10L).map(i => (i, s"rock$i paper$i scissors$i lizard$i")))
      .toDF("doc_id", "text")
    val out = Corpus.dsirSample(raw, target, k = 3, buckets = 512, seed = 7L)
      .collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId.contains(1L), "the in-domain doc must be sampled")
    // every selected score must dominate every unselected one under the
    // same total order (score desc, doc_id asc)
    val all = Corpus.dsirSample(raw, target, k = 100, buckets = 512, seed = 7L)
      .collect().map(r => (r.getLong(4), -r.getLong(0))).sorted(
        Ordering[(Long, Long)].reverse)
    val kept = out.map(r => (r.getLong(4), -r.getLong(0))).toSet
    assert(all.take(3).forall(kept), "top-k must equal the global order prefix")
    // integer weight replay: doc 1's w_micro = sum over its gram buckets
    // of cnt * round(1e6*(ln((tc+1)/(T+B)) - ln((rc+1)/(R+B))))
    val B = 512
    def grams(s: String): Seq[String] = {
      val t = s.split("\\s+").toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    val tCnt = (100L until 110L).flatMap(_ => grams("alpha beta gamma alpha beta"))
      .groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val rawDocs = (1L, "alpha beta gamma alpha beta gamma") +:
      (2L until 10L).map(i => (i, s"rock$i paper$i scissors$i lizard$i"))
    val rCnt = rawDocs.flatMap(d => grams(d._2))
      .groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
    val tTot = tCnt.values.sum; val rTot = rCnt.values.sum
    def lrMicro(b: Int): Long =
      microHU(math.log((tCnt.getOrElse(b, 0L) + 1).toDouble / (tTot + B)) -
        math.log((rCnt.getOrElse(b, 0L) + 1).toDouble / (rTot + B)))
    val expW = grams("alpha beta gamma alpha beta gamma")
      .groupBy(bucket).map { case (b, g) => g.size * lrMicro(b) }.sum
    assert(byId(1L).getLong(2) == expW, "w_micro must replay exactly")
  }

  test("lmPerplexity: add-1 bigram model replays exactly; short docs null") {
    // corpus bigrams: "a b"×3, "b a"×1, "b c"×1 → ctx(a)=3, ctx(b)=2;
    // vocab {a,b,c,z} → V=4
    val docs = Seq(
      1L -> "a b a b", // bigrams: a b, b a, a b
      2L -> "a b c",   // bigrams: a b, b c
      3L -> "z").toDF("doc_id", "text")
    def lp(c: Long, ctx: Long): Long =
      microHU(math.log((c + 1).toDouble / (ctx + 4)))
    val lpAB = lp(3, 3); val lpBA = lp(1, 2); val lpBC = lp(1, 2)
    val m = Corpus.lmPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 3 && m(1L).getLong(2) == 2 * lpAB + lpBA)
    assert(m(2L).getLong(1) == 2 && m(2L).getLong(2) == lpAB + lpBC)
    def ppl(ll: Long, n: Long): Double =
      BigDecimal(math.exp(-ll.toDouble / 1e6 / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L).getDouble(3) == ppl(2 * lpAB + lpBA, 3))
    assert(m(2L).getDouble(3) == ppl(lpAB + lpBC, 2))
    // the common-bigram doc is more "fluent" under the corpus LM
    assert(m(1L).getDouble(3) < m(2L).getDouble(3))
    assert(m(3L).getLong(1) == 0 && m(3L).getLong(2) == 0 && m(3L).isNullAt(3))
  }

  test("lmPerplexity broadcasts the scored bigram dim") {
    val docs = (0L until 30L).map(i => (i, s"the cat $i sat on mat $i"))
      .toDF("doc_id", "text")
    val plan = Corpus.lmPerplexity(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the lp dim must broadcast onto the per-doc bigram counts")
  }

  test("broadcastDims=false: shuffled dim joins return identical results") {
    // the 100 TB escape hatch for the unbounded vocab/bigram dims: with
    // the hint off (and auto-broadcast disabled so the fallback REALLY
    // runs as a shuffled join), every operator must return byte-identical
    // rows to the broadcast default
    val docs = Seq(
      1L -> "the the cat sat on the mat",
      2L -> "the zzqx cat",
      3L -> "").toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val hinted = Seq(
      rows(Corpus.tfidfTopK(docs, 3, 3L)),
      rows(Corpus.termFreqQuality(docs)),
      rows(Corpus.lmPerplexity(docs)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Seq(
        rows(Corpus.tfidfTopK(docs, 3, 3L, broadcastDims = false)),
        rows(Corpus.termFreqQuality(docs, broadcastDims = false)),
        rows(Corpus.lmPerplexity(docs, broadcastDims = false)))
      assert(shuffled == hinted)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("dsirSample plans a broadcast ratio dim and a TakeOrdered pick") {
    val docs = (0L until 40L).map(i => (i, s"tok$i common words here"))
      .toDF("doc_id", "text")
    val plan = Corpus.dsirSample(docs, docs.limit(5), k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must be a distributed TakeOrdered, not a global sort")
    assert(plan.contains("BroadcastHashJoin"),
      "the log-ratio dim must broadcast onto the per-doc counts")
  }

  test("qualityClassifier: logit equals an independent driver replay; edges") {
    // driver replay of the full formula: unigrams + bigrams, md5 'qf:'
    // bucket, md5 'qw:' weight table — including the 0-token and 1-token
    // (no bigram) edges and the keep threshold on both sides of 0
    val docs = Seq(
      (1L, "the quick brown fox"), // 4 uni + 3 bi
      (2L, "solo"),                // 1 uni, no bigram
      (3L, ""),                    // no features: logit = bias = 0, keep
      (4L, "  padded   spacing  ") // whitespace-normalized tokens
    ).toDF("doc_id", "text")
    val buckets = 4096
    val w = Corpus.classifierWeights(buckets)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    def bucket(g: String): Int =
      (java.lang.Long.parseLong(md5hex("qf:" + g).substring(0, 15), 16)
        % buckets).toInt
    def expected(text: String): (Long, Long) = {
      val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (grams.size.toLong, grams.map(g => w(bucket(g))).sum)
    }
    val got = Corpus.qualityClassifier(docs, buckets)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox", 2L -> "solo",
        3L -> "", 4L -> "  padded   spacing  ")) {
      val (nf, logit) = expected(text)
      assert(got(id) == ((nf, logit, if (logit >= 0) 1L else 0L)),
        s"doc $id: got ${got(id)}, expected ($nf, $logit)")
    }
    // the weight table is genuinely signed (a one-sided table would make
    // `keep` degenerate) and the stand-in is deterministic
    assert(w.exists(_ < 0) && w.exists(_ > 0))
    assert(w == Corpus.classifierWeights(buckets))
  }

  test("qualityClassifier is a pure per-row projection: no shuffle") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Corpus.qualityClassifier(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"classifier inference must ride the scan, no shuffle:\n$plan")
  }

  test("mixtureSample: largest-remainder quotas sum to k, caps at domain size, draw replays") {
    def textOf(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // heavy (6400 tokens), light (100), tiny 2-doc domain — shares force
    // fractional quotas so the remainder apportionment actually fires
    val rows = (1L to 8L).map(i => (i, textOf(800), "heavy")) ++
      (11L to 15L).map(i => (i, textOf(20), "light")) ++
      Seq((21L, textOf(50), "tiny"), (22L, textOf(50), "tiny"))
    val docs = rows.toDF("doc_id", "text", "source")
    val k = 7
    val got = Corpus.mixtureSample(docs, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // driver replay of weights → quotas
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = Map("heavy" -> 8L * 800, "light" -> 5L * 20, "tiny" -> 2L * 50)
    val nDocs = Map("heavy" -> 8L, "light" -> 5L, "tiny" -> 2L)
    val total = toks.values.sum.toDouble
    def rnd(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val sMicro = toks.view.mapValues(t => rnd(math.sqrt(t / total) * 1e6)).toMap
    val sSum = sMicro.values.sum
    val wMicro = sMicro.view.mapValues(s => rnd(s.toDouble * 1e6 / sSum)).toMap
    val base = wMicro.view.mapValues(w => w * k / 1000000L).toMap
    val rem = wMicro.view.mapValues(w => w * k % 1000000L).toMap
    val deficit = k - base.values.sum
    val order = rem.toSeq.sortBy { case (d, r) => (-r, d) }.map(_._1)
    val quota = order.zipWithIndex.map { case (d, i) =>
      d -> math.min(base(d) + (if (i < deficit) 1L else 0L), nDocs(d))
    }.toMap
    val gotQuota = got.map(r => r._2 -> r._4).toMap
    assert(gotQuota == quota.filter(_._2 > 0),
      s"quota mismatch: got $gotQuota want $quota")
    // every domain fills its quota exactly (none is undersized here
    // unless capped), rk is 1..quota
    for ((d, q) <- quota if q > 0)
      assert(got.filter(_._2 == d).map(_._3).sorted.toSeq == (1L to q),
        s"domain $d did not fill ranks 1..$q")
    // the draw itself replays: per domain, quota smallest (md5, id)
    for ((d, q) <- quota if q > 0) {
      val ids = rows.collect { case (id, _, `d`) => id }
      val want = ids.sortBy(id => (md5hex(s"mix:42:$id"), id)).take(q.toInt)
      assert(got.filter(_._2 == d).sortBy(_._3).map(_._1).toSeq == want)
    }
    // total draw = k unless capping bit
    assert(got.length == quota.values.sum)
  }

  test("bpePairCounts: pair counts match a driver replay; top-k is a distributed take") {
    // 'abab' ×3, 'abc' ×2, 'x' ×1 (len-1 words emit no pairs)
    val docs = Seq(
      (1L, "abab abc x"),
      (2L, "abab abc"),
      (3L, "ABAB x")). // lowercased before splitting
      toDF("doc_id", "text")
    val got = Corpus.bpePairCounts(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // driver replay over the word dictionary
    val words = Seq("abab" -> 3L, "abc" -> 2L, "x" -> 1L)
    val want = words.filter(_._1.length >= 2).flatMap { case (w, c) =>
      w.sliding(2).map(p => s"${p(0)} ${p(1)}" -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, c), i) => (p, c, i + 1L) }
    assert(got.toSeq == want)
    // 'a b' counts 2 per 'abab' occurrence: the within-word repeat folds
    assert(got.find(_._1 == "a b").get._2 == 3L * 2 + 2L)
    // top-k plans as TakeOrderedAndProject, never a global Sort
    val plan = Corpus.bpePairCounts(docs, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"BPE top-k is not a distributed take:\n$plan")
  }

  test("chunkSequences: boundaries, overlap, hashes; partition covers exactly once") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = (1 to 10).map(i => s"t$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, "solo"), (3L, "  "))
      .toDF("doc_id", "text")
    // size=4 stride=3: starts 0,3,6,9 → lengths 4,4,4,1
    val got = Corpus.chunkSequences(docs, size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(r => (r._1, r._2))
    val wantDoc1 = Seq(0, 3, 6, 9).zipWithIndex.map { case (s, i) =>
      val c = toks.slice(s, s + 4)
      (1L, i.toLong, s.toLong, c.length.toLong, md5hex(c.mkString(" ")))
    }
    assert(got.filter(_._1 == 1L).toSeq == wantDoc1)
    assert(got.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 0L, 1L, md5hex("solo"))))
    assert(!got.exists(_._1 == 3L), "whitespace-only doc emits no chunks")
    // stride = size partitions the stream: chunk lengths sum to n, no overlap
    val part = Corpus.chunkSequences(docs, size = 4, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(part.filter(_._1 == 1L).map(_._2).sum == 10L)
    // zero shuffle: chunking rides the scan
    val plan = Corpus.chunkSequences(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must be per-row, no shuffle:\n$plan")
  }
}
