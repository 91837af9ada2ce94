package graft

import graft.fetch.FetchSim
import graft.frontier.{PoolIndex, SeenIndex}
import graft.functions.UrlFns
import graft.pipeline.{CrawlConfig, Crawler}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Delta-pool (LSM frontier) semantics — the Iceberg MERGE-INTO /
 * positional-delete shape behind `CrawlConfig.poolDeltaRounds`: delta
 * rounds append only the round's new urls, popped rows leave the pool
 * logically via the seen-archive filter, every K-th round compacts with
 * the classic full merge. The load-bearing property is EXACT equivalence
 * with the classic per-round rewrite: same pops in the same rounds, same
 * docs, same frontier end state.
 */
class DeltaPoolSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-delta").toString

  /** Full observable crawl state, for cross-mode comparison. */
  private def stateOf(c: Crawler): (Set[(String, Long)], Set[String], Long) = (
    c.frontier().select("url", "last_visit").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet,
    c.docs().select("doc_id").collect().map(_.getString(0)).toSet,
    c.docs().count())

  private def runCrawl(cfg: CrawlConfig, sim: FetchSim, seeds: Seq[String],
      rounds: Int): (Crawler, Seq[graft.pipeline.RoundStats]) = {
    val dir = tmpDir()
    val c = new Crawler(spark, dir, sim, cfg)
    c.addSeeds(seeds)
    val stats = (1 to rounds).map(_ => c.round())
    (c, stats)
  }

  test("delta mode ≡ classic rewrite: ungated crawl (pops, docs, frontier identical)") {
    val sim = new FetchSim(numHosts = 12, pagesPerHost = 12, linksPerPage = 4)
    val base = CrawlConfig(numBuckets = 8, perHostBudget = 3, perBucketBudget = 100)
    val seeds = sim.seedUrls(10)
    // 7 rounds with K=3: deltas at r1,r2, compaction at r3, deltas r4,r5,
    // compaction r6, delta r7 — every phase transition covered
    val (cc, sc) = runCrawl(base, sim, seeds, 7)
    val (cd, sd) = runCrawl(base.copy(poolDeltaRounds = 3), sim, seeds, 7)
    assert(sd.map(s => (s.round, s.popped, s.fetchedOk, s.errors, s.newUrls, s.frontierRows)) ==
      sc.map(s => (s.round, s.popped, s.fetchedOk, s.errors, s.newUrls, s.frontierRows)),
      "per-round stats diverge between delta and classic modes")
    assert(stateOf(cd) == stateOf(cc), "end state diverges")
  }

  test("delta mode ≡ classic rewrite: politeness-gated crawl (admission verdicts identical)") {
    val sim = new FetchSim(numHosts = 10, pagesPerHost = 12, linksPerPage = 4)
    // rate < budget so the throttle really rejects offers; rejected rows
    // stay pooled and re-offer next round — the stale-row-heavy regime
    val base = CrawlConfig(numBuckets = 8, perHostBudget = 4, perBucketBudget = 100,
      politenessRate = 2.0, politenessBurst = 2.0)
    val seeds = sim.seedUrls(10)
    val (cc, sc) = runCrawl(base, sim, seeds, 7)
    val (cd, sd) = runCrawl(base.copy(poolDeltaRounds = 3), sim, seeds, 7)
    assert(sd.map(s => (s.round, s.popped, s.offered, s.frontierRows)) ==
      sc.map(s => (s.round, s.popped, s.offered, s.frontierRows)))
    assert(stateOf(cd) == stateOf(cc))
  }

  test("delta rounds append, compaction absorbs: manifest + layout lifecycle") {
    import java.nio.file.{Files, Paths}
    val sim = new FetchSim(numHosts = 8, pagesPerHost = 10, linksPerPage = 4)
    val dir = tmpDir()
    val c = new Crawler(spark, dir, sim,
      CrawlConfig(numBuckets = 4, perHostBudget = 3, perBucketBudget = 100,
        poolDeltaRounds = 3))
    c.addSeeds(sim.seedUrls(8))
    def snap = graft.sources.IcebergishTable.parseManifest(
      Files.readString(Paths.get(s"$dir/frontier/manifest.json")))
    assert(snap.compactRound == 0 && snap.round == 0)
    c.round() // r1: delta
    assert(snap.round == 1 && snap.compactRound == 0)
    assert(Files.exists(Paths.get(s"$dir/frontier/delta/round=1")))
    c.round() // r2: delta
    assert(snap.round == 2 && snap.compactRound == 0)
    c.round() // r3: compaction
    assert(snap.round == 3 && snap.compactRound == 3)
    assert(!Files.exists(Paths.get(s"$dir/frontier/delta")),
      "compaction must delete absorbed delta dirs")
    c.round() // r4: delta again
    assert(snap.round == 4 && snap.compactRound == 3)
    // manifest live-row arithmetic stays exact vs a physical count
    val live = c.frontier().filter(col("last_visit") === 0L).count()
    assert(snap.rows == live, s"manifest rows ${snap.rows} != live pool $live")
    // ever-seen view duplicate-free (first-seen dedup exact across
    // base/delta/archive tiers)
    val f = c.frontier()
    assert(f.count() == f.select("url").distinct().count())
  }

  test("resume mid-delta from cold caches: fresh instance + invalidated indexes") {
    val sim = new FetchSim(numHosts = 10, pagesPerHost = 10, linksPerPage = 4)
    val cfgD = CrawlConfig(numBuckets = 4, perHostBudget = 3, perBucketBudget = 100,
      poolDeltaRounds = 3)
    // uninterrupted reference
    val (cu, _) = runCrawl(cfgD, sim, sim.seedUrls(8), 6)
    // interrupted: stop after 2 delta rounds (mid-delta, before any
    // compaction), then resume with a FRESH crawler and cold JVM caches —
    // PoolIndex/SeenIndex must rebuild exactly from disk
    val dir = tmpDir()
    val c1 = new Crawler(spark, dir, sim, cfgD)
    c1.addSeeds(sim.seedUrls(8))
    c1.round(); c1.round()
    PoolIndex.invalidate(); SeenIndex.invalidate()
    val c2 = new Crawler(spark, dir, sim, cfgD)
    assert(c2.lastRound == 2)
    (3 to 6).foreach(_ => c2.round())
    assert(stateOf(c2) == stateOf(cu))
  }

  test("torn delta round: crash after delta/docs/seen writes, before manifest rename, replays byte-identically") {
    import java.nio.file.{Files, Path, Paths}
    def copyTree(from: String, to: String): Unit = {
      val src = Paths.get(from)
      Files.walk(src).forEach { p =>
        val dst = Paths.get(to, src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else { Files.createDirectories(dst.getParent); Files.copy(p, dst) }
      }
    }
    def sha(p: Path): String = UrlFns.sha256Hex(Files.readAllBytes(p))
    def treeHashes(root: String, sub: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      Files.walk(Paths.get(root, sub)).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) out += sha(p)
      }
      out.sorted.toSeq
    }
    val sim = new FetchSim(numHosts = 12, pagesPerHost = 8, linksPerPage = 4)
    val cfg = CrawlConfig(numBuckets = 4, perHostBudget = 3, perBucketBudget = 100,
      poolDeltaRounds = 4)
    val dir = tmpDir()
    val c = new Crawler(spark, dir, sim, cfg)
    c.addSeeds(sim.seedUrls(10))
    c.round() // r1 (delta) committed
    val torn = tmpDir()
    copyTree(dir, torn)
    val ref = c.round() // r2 (delta) on the reference run
    assert(ref.popped > 0)
    // crash window: round-2 docs, seen archive, and the delta dir are on
    // disk but the manifest rename never happened
    copyTree(s"$dir/docs/round=2", s"$torn/docs/round=2")
    copyTree(s"$dir/seen/round=2", s"$torn/seen/round=2")
    copyTree(s"$dir/frontier/delta/round=2", s"$torn/frontier/delta/round=2")
    PoolIndex.invalidate(); SeenIndex.invalidate()
    val c2 = new Crawler(spark, torn, sim, cfg)
    assert(c2.lastRound == 1, "torn round must not be visible before replay")
    val replayed = c2.round()
    assert(replayed.popped == ref.popped)
    assert(treeHashes(torn, "frontier") == treeHashes(dir, "frontier"))
    assert(treeHashes(torn, "docs") == treeHashes(dir, "docs"))
    assert(treeHashes(torn, "seen") == treeHashes(dir, "seen"))
  }

  test("crawl to closure in delta mode: chain fully visited, pool exhausts cleanly") {
    val n = 20
    val dir = tmpDir()
    val sim = new FetchSim(chainLength = n)
    val c = new Crawler(spark, dir, sim, CrawlConfig(
      numBuckets = 4, perHostBudget = 10, perBucketBudget = 100,
      poolDeltaRounds = 3))
    c.addSeeds(Seq("http://chain.test/p/0"))
    val stats = c.crawlUntilEmpty(maxRounds = n + 5)
    val visited = c.frontier().filter(col("last_visit") > 0)
      .select("url").collect().map(_.getString(0)).toSet
    assert(visited == (0 until n).map(i => s"http://chain.test/p/$i").toSet)
    assert(stats.map(_.popped).sum == n)
    assert(c.docs().count() == n)
  }

  test("delta mode guard: incompatible samplers are rejected loudly") {
    val sim = new FetchSim(numHosts = 4, pagesPerHost = 4)
    intercept[IllegalArgumentException] {
      new Crawler(spark, tmpDir(), sim,
        CrawlConfig(sampler = "pair", poolDeltaRounds = 3))
    }
  }
}
