package graft

import graft.fetch.FetchSim
import graft.functions.UrlFns
import graft.pipeline.{CrawlConfig, Crawler}
import graft.streaming.{Politeness, StreamingCrawler}
import graft.streaming.Politeness.Candidate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics: per-host politeness token buckets
  * (flatMapGroupsWithState), robots filtering, and the micro-batch-per-round
  * streaming crawler incl. checkpoint resume (SURVEY.md §2.6). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stream").toString

  test("politeness token bucket: per-host budget enforced per round, refills across rounds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Candidate]
    val throttled = Politeness.throttle(in.toDS(), ratePerRound = 2.0, burst = 2.0)
    val q = throttled.writeStream.format("memory").queryName("throttle_out")
      .outputMode("append").start()
    try {
      // round 1: 5 candidates for host a, 1 for host b → admit 2 + 1
      in.addData(
        Candidate("http://a.test/1", "a.test", 1L, 1L),
        Candidate("http://a.test/2", "a.test", 1L, 2L),
        Candidate("http://a.test/3", "a.test", 1L, 3L),
        Candidate("http://a.test/4", "a.test", 1L, 4L),
        Candidate("http://a.test/5", "a.test", 1L, 5L),
        Candidate("http://b.test/1", "b.test", 1L, 1L))
      q.processAllAvailable()
      val r1 = spark.table("throttle_out").collect()
      assert(r1.count(_.getAs[String]("host") == "a.test") == 2)
      assert(r1.count(_.getAs[String]("host") == "b.test") == 1)
      // admitted in priority order
      assert(r1.filter(_.getAs[String]("host") == "a.test")
        .map(_.getAs[String]("url")).toSet ==
        Set("http://a.test/1", "http://a.test/2"))
      // round 2: tokens refilled by rate → 2 more admitted
      in.addData(
        Candidate("http://a.test/6", "a.test", 2L, 6L),
        Candidate("http://a.test/7", "a.test", 2L, 7L),
        Candidate("http://a.test/8", "a.test", 2L, 8L))
      q.processAllAvailable()
      val r2 = spark.table("throttle_out").collect()
      assert(r2.count(_.getAs[String]("host") == "a.test") == 4)
    } finally q.stop()
  }

  test("partition-local throttleRound ≡ window form (admitted set + next state)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // popped rows across several hosts incl. one with existing state, one
    // unseen, one starved (0 tokens, refill below 1): both forms must
    // admit the SAME set and produce the SAME next-state table
    val popped = Seq(
      ("http://a.test/1", "a.test", 0, 1, 10L), ("http://a.test/2", "a.test", 0, 0, 11L),
      ("http://a.test/3", "a.test", 0, 1, 9L), ("http://b.test/1", "b.test", 1, 2, 5L),
      ("http://b.test/2", "b.test", 1, 2, 4L), ("http://c.test/1", "c.test", 2, 0, 1L))
      .toDF("url", "host", "host_bucket", "depth", "discovered_at")
      .repartition(3, col("host_bucket"))
    val state = Seq(("a.test", 1.2, 6L), ("c.test", 0.1, 6L), ("idle.test", 0.7, 2L))
      .toDF("host", "tokens", "last_round")
    val (admP, stP) = Politeness.throttleRound(popped, state, 7L, 0.5, 2.0)
    val (admW, stW) = Politeness.throttleRoundWindow(popped, state, 7L, 0.5, 2.0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(admP) == rows(admW), "admitted sets differ")
    assert(rows(stP.select("host", "tokens", "last_round")) ==
      rows(stW.select("host", "tokens", "last_round")), "state tables differ")
    // sanity on the semantics themselves: a refills to 1.7 → admits 1
    // (min depth, then discovered_at), c refills to 0.6 → admits 0,
    // idle carries untouched
    val admByHost = admP.collect().groupBy(_.getString(1)).view.mapValues(_.map(_.getString(0)).toSet).toMap
    assert(admByHost.getOrElse("a.test", Set()) == Set("http://a.test/2"))
    assert(!admByHost.contains("c.test"))
    val st = stP.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(st("idle.test") == ((0.7, 2L)))
    assert(st("c.test") == ((0.6, 7L)))
  }

  test("fused sorted-pop admission ≡ pop → window flagging (heap eviction included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.frontier.Frontier
    // commit a frontier through the real table so the fused pass sees the
    // sorted bucket files it requires; perBucketBudget=3 forces the
    // per-bucket heap to EVICT (7 hosts × budget 2 >> 3 per bucket) — the
    // regime where flag-before-truncate vs truncate-before-flag could
    // diverge if the prefix property did not hold
    val dir = java.nio.file.Files.createTempDirectory("graft-fused-pop").toString
    val table = new graft.sources.IcebergishTable(dir, Frontier.schema,
      sortCols = Seq("host", "depth", "discovered_at", "url"))
    val f = Frontier.normalizeCandidates(
      (0 until 200).map(i => (s"http://h${i % 7}.test/p/$i", i % 3, i.toLong))
        .toDF("url", "depth", "discovered_at"), 4)
    table.commit(f, 0)
    val state = Seq(("h0.test", 1.2, 6L), ("h3.test", 0.1, 6L))
      .toDF("host", "tokens", "last_round")
    val (roundId, rate, burst) = (7L, 0.5, 2.0)
    val m = Politeness.stateMapOf(state, 1000000).get
    val fused = Frontier.popSortedFifoFlagged(table.read(spark), 2, 3,
      spark.sparkContext.broadcast(m), roundId, rate, burst)
    val reference = Politeness.flagAdmissionsWindow(
      Frontier.pop(table.read(spark), "fifo", 42L, 2, 3, sorted = true),
      state, roundId, rate, burst)
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getBoolean(5))).toSet
    assert(verdicts(fused) == verdicts(reference))
    // heap eviction really happened: 7 hosts × budget 2 = 14 offered, and
    // pigeonhole puts ≥2 hosts (≥4 offers > cap 3) in some bucket
    assert(fused.count() < 14)
    // and the next-state tables agree too
    def stRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(stRows(Politeness.nextState(fused, state, roundId, rate, burst)) ==
      stRows(Politeness.nextState(reference, state, roundId, rate, burst)))
  }

  test("robots rules are deterministic; filter drops disallowed paths") {
    val host = "h1.test"
    val dis = UrlFns.robotsDisallow(host)
    assert(dis == UrlFns.robotsDisallow(host))
    assert(dis.contains("/private"))
    assert(!UrlFns.robotsAllowed(s"http://$host/private/x"))
    dis.filter(_.startsWith("/p/")).foreach { p =>
      assert(!UrlFns.robotsAllowed(s"http://$host$p"))
      assert(!UrlFns.robotsAllowed(s"http://$host$p/sub"))
    }
    assert(UrlFns.robotsAllowed(s"http://$host/about"))
  }

  test("crawler with respectRobots never visits disallowed urls") {
    val dir = tmpDir()
    val sim = new FetchSim(numHosts = 10, pagesPerHost = 10)
    val c = new Crawler(spark, dir, sim, CrawlConfig(
      numBuckets = 4, perHostBudget = 5, perBucketBudget = 100,
      respectRobots = true))
    c.addSeeds(sim.seedUrls(8))
    c.round(); c.round(); c.round()
    val urls = c.frontier().select("url").collect().map(_.getString(0))
    assert(urls.nonEmpty)
    urls.foreach(u => assert(UrlFns.robotsAllowed(u), s"disallowed url in frontier: $u"))
  }

  test("torn round: crash between docs write and manifest rename replays byte-identically") {
    import java.nio.file.{Files, Paths, Path}
    def copyTree(from: String, to: String): Unit = {
      val src = Paths.get(from)
      Files.walk(src).forEach { p =>
        val dst = Paths.get(to, src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else { Files.createDirectories(dst.getParent); Files.copy(p, dst) }
      }
    }
    def sha(p: Path): String = UrlFns.sha256Hex(Files.readAllBytes(p))
    // bucket-dir → sorted content hashes of its parquet files (names carry
    // task UUIDs and the data dir a commit nonce — CONTENT must match)
    def bucketHashes(root: String): Map[String, Seq[String]] = {
      val r = Paths.get(root)
      val out = scala.collection.mutable.Map.empty[String, Seq[String]]
      Files.walk(r).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet") &&
            p.getParent.getFileName.toString.startsWith("hb="))
          out(p.getParent.getFileName.toString) =
            (out.getOrElse(p.getParent.getFileName.toString, Seq.empty) :+ sha(p)).sorted
      }
      out.toMap
    }
    val sim = new FetchSim(numHosts = 12, pagesPerHost = 8)
    val cfg = CrawlConfig(numBuckets = 4, perHostBudget = 3, perBucketBudget = 100)
    val dir = tmpDir()
    val c = new Crawler(spark, dir, sim, cfg)
    c.addSeeds(sim.seedUrls(10))
    c.round() // round 1 committed
    // snapshot the pre-round-2 state, then run round 2 on the original
    // (the uninterrupted reference run)
    val torn = tmpDir()
    copyTree(dir, torn)
    val ref = c.round()
    assert(ref.popped > 0)
    // construct the EXACT crash window the manifest protocol claims to
    // survive (argued in Crawler scaladoc, tested here — VERDICT r2 #9):
    // docs/round=2 and the new frontier data dir are on disk, but the
    // manifest.json rename never happened (so prune never ran either)
    copyTree(s"$dir/docs/round=2", s"$torn/docs/round=2")
    copyTree(s"$dir/seen/round=2", s"$torn/seen/round=2")
    val strayIt = Files.list(Paths.get(s"$dir/frontier")).iterator()
    var strayName: String = null
    while (strayIt.hasNext) {
      val p = strayIt.next()
      if (p.getFileName.toString.startsWith("data-r2-")) {
        copyTree(p.toString, s"$torn/frontier/${p.getFileName}")
        strayName = p.getFileName.toString
      }
    }
    assert(strayName != null, "expected a round-2 data dir in the reference run")
    // resume through the streaming front-end: the first micro-batch must
    // replay round 2 idempotently (overwrite docs, re-commit, prune stray)
    val c2 = new Crawler(spark, torn, sim, cfg)
    assert(c2.lastRound == 1, "torn round must NOT be visible before replay")
    val sc = new StreamingCrawler(spark, c2, s"$torn/checkpoint-torn")
    val replayed = sc.run(maxRounds = 1)
    assert(c2.lastRound >= 2)
    assert(replayed.headOption.map(_.popped).contains(ref.popped))
    // processAllAvailable may have fired extra micro-batches past round 2;
    // both runs are deterministic, so advance the reference to the same
    // round before comparing state
    while (c.lastRound < c2.lastRound) c.round()
    // byte-identical replay: every frontier bucket file and every docs
    // round file matches the uninterrupted run content-for-content
    assert(bucketHashes(s"$torn/frontier") == bucketHashes(s"$dir/frontier"))
    def treeHashes(root: String, sub: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      Files.walk(Paths.get(root, sub)).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) out += sha(p)
      }
      out.sorted.toSeq
    }
    if (treeHashes(torn, "docs") != treeHashes(dir, "docs")) {
      def dump(root: String): Unit =
        Files.walk(Paths.get(root, "docs")).forEach { p =>
          if (p.getFileName.toString.endsWith(".parquet"))
            println(s"[torn-debug] $p bytes=${Files.size(p)} sha=${sha(p).take(12)}")
        }
      println(s"[torn-debug] TORN tree:"); dump(torn)
      println(s"[torn-debug] REF tree:"); dump(dir)
    }
    assert(treeHashes(torn, "docs") == treeHashes(dir, "docs"))
    // the append-only seen archive must replay byte-identically too
    assert(treeHashes(torn, "seen") == treeHashes(dir, "seen"))
    // and the torn round's stray data dir (identified by its commit nonce)
    // did not survive the replayed commit's prune
    val staleDirs = Files.list(Paths.get(s"$torn/frontier")).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (staleDirs.hasNext) names += staleDirs.next().getFileName.toString
    assert(!names.contains(strayName), s"stray torn-round data dir not pruned: $names")
  }

  test("streaming crawler: micro-batch rounds crawl the chain to closure, then resume-noop") {
    val n = 12
    val dir = tmpDir()
    val sim = new FetchSim(chainLength = n)
    val c = new Crawler(spark, dir, sim, CrawlConfig(4, 10, 100))
    c.addSeeds(Seq("http://chain.test/p/0"))
    val sc = new StreamingCrawler(spark, c, s"$dir/checkpoint")
    val stats = sc.run(maxRounds = n + 3)
    assert(stats.nonEmpty && stats.map(_.popped).sum == n)
    assert(c.docs().count() == n)
    // a fresh streaming crawler on the same workDir resumes and drains to 0
    val c2 = new Crawler(spark, dir, sim, CrawlConfig(4, 10, 100))
    val sc2 = new StreamingCrawler(spark, c2, s"$dir/checkpoint2")
    val stats2 = sc2.run(maxRounds = 3)
    assert(stats2.isEmpty, s"resumed crawl should be drained, got $stats2")
    assert(c2.docs().count() == n)
  }

  test("driver-resident politeness state ≡ cold per-round parquet path") {
    // The hot path seeds round r+1's admission map from the map round r
    // just merged on the driver; the cold path (a FRESH Crawler instance
    // every round) can never hit that cache and always reloads the state
    // parquet. Same seeds + fractional rate ⇒ identical visited sets,
    // identical per-(host, round) admissions, and identical state-table
    // rows (exact doubles) for every round.
    val cfg = CrawlConfig(numBuckets = 4, perHostBudget = 10,
      perBucketBudget = 1000000, politenessRate = 0.7, politenessBurst = 2.0)
    def mkSim() = new FetchSim(numHosts = 3, pagesPerHost = 12, linksPerPage = 2)
    val seeds = (0 until 6).flatMap(i =>
      (0 until 3).map(h => s"http://h$h.test/p/$i"))
    val rounds = 5

    val dirHot = tmpDir()
    val hot = new Crawler(spark, dirHot, mkSim(), cfg)
    hot.addSeeds(seeds)
    (1 to rounds).foreach(_ => hot.round())

    val dirCold = tmpDir()
    new Crawler(spark, dirCold, mkSim(), cfg).addSeeds(seeds)
    (1 to rounds).foreach(_ => new Crawler(spark, dirCold, mkSim(), cfg).round())

    def visits(dir: String): Map[(String, Long), Long] = {
      val c = new Crawler(spark, dir, mkSim(), cfg)
      c.frontier().filter(col("last_visit") > 0)
        .groupBy(col("host"), col("last_visit")).count().collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val hv = visits(dirHot)
    assert(hv.nonEmpty && hv == visits(dirCold))

    def stateRows(dir: String, r: Int): Seq[(String, Double, Long)] =
      spark.read.parquet(s"$dir/politeness/round-$r")
        .select("host", "tokens", "last_round").collect()
        .map(x => (x.getString(0), x.getDouble(1), x.getLong(2)))
        .sortBy(_._1).toSeq
    (1 to rounds).foreach { r =>
      assert(stateRows(dirHot, r) == stateRows(dirCold, r),
        s"state table diverged at round $r")
    }
  }

  test("streaming first-seen dedup: cross-batch duplicates dropped, within-batch min id wins") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val in = MemoryStream[(Long, String)]
    val out = StreamingDedup.firstSeen(in.toDS().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts + a within-batch dup (7 vs 3: min wins);
      // whitespace/case variants normalize into the same fingerprint
      in.addData((3L, "the cat sat"), (7L, "THE  cat   sat"), (5L, "other text"))
      q.processAllAvailable()
      val r1 = spark.table("dedup_out").collect()
        .map(r => r.getLong(0)).sorted.toSeq
      assert(r1 == Seq(3L, 5L), s"batch 1 emitted $r1")
      // batch 2: a cross-batch dup of batch 1 (dropped, even with a
      // smaller id) + one genuinely new doc
      in.addData((1L, "the cat sat"), (9L, "fresh content"))
      q.processAllAvailable()
      val r2 = spark.table("dedup_out").collect()
        .map(r => r.getLong(0)).sorted.toSeq
      assert(r2 == Seq(3L, 5L, 9L), s"after batch 2: $r2")
      // fingerprints match the batch operator's exactly (one row each)
      val fps = spark.table("dedup_out").collect()
        .map(r => r.getString(1)).toSeq
      assert(fps.distinct.size == 3)
    } finally q.stop()
  }
}
