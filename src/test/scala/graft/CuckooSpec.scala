package graft

import graft.frontier.{CuckooFilter, Frontier, SeenFilterStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-partition cuckoo-filter seen-set refinement (north rule):
  * filter invariants, per-round checkpointing, and the advisory-only
  * property — split + exact == exact. */
class CuckooSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cuckoo filter: no false negatives, low false positives, delete works") {
    val f = new CuckooFilter(10000)
    val keys = (0 until 8000).map(i => s"http://h$i.test/p/$i")
    keys.foreach(k => assert(f.add(k)))
    keys.foreach(k => assert(f.mightContain(k), s"false negative for $k"))
    val fps = (0 until 10000).count(i => f.mightContain(s"http://other$i.test/x"))
    assert(fps < 50, s"false positive rate too high: $fps/10000")
    assert(f.remove(keys.head))
    // removal of one fingerprint copy; the key may still collide, but a
    // fresh filter must not contain it
    val f2 = new CuckooFilter(100)
    f2.add("a"); assert(f2.mightContain("a"))
    f2.remove("a"); assert(!f2.mightContain("a"))
  }

  test("cuckoo filter: serialize/deserialize round-trips") {
    val f = new CuckooFilter(1000)
    (0 until 500).foreach(i => f.add(s"k$i"))
    val g = CuckooFilter.deserialize(f.serialize())
    (0 until 500).foreach(i => assert(g.mightContain(s"k$i")))
    assert(g.numBuckets == f.numBuckets)
  }

  test("seen-filter store: incremental rounds, split is advisory-correct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cuckoo").toString
    val store = new SeenFilterStore(dir)

    def frame(urls: Seq[String]) = Frontier.normalizeCandidates(
      urls.zipWithIndex.map { case (u, i) => (u, 0, i.toLong) }
        .toDF("url", "depth", "discovered_at"), numBuckets = 4)

    val round1Urls = (0 until 200).map(i => s"http://h${i % 9}.test/p/$i")
    store.updateAndSave(spark, 1, 0, frame(round1Urls), frame(round1Urls))
    assert(store.load(spark, 1).get.count() <= 4)

    // round 2 adds more; filters must still contain round 1
    val round2Urls = (200 until 300).map(i => s"http://h${i % 9}.test/p/$i")
    store.updateAndSave(spark, 2, 1, frame(round2Urls), frame(round1Urls ++ round2Urls))

    // candidates: half seen (from round 1/2), half fresh
    val seenCands = (round1Urls.take(50) ++ round2Urls.take(50))
    val freshCands = (0 until 100).map(i => s"http://h${i % 9}.test/fresh/$i")
    val cands = frame(scala.util.Random.shuffle(seenCands ++ freshCands))
    val (provablyNew, maybeSeen) = store.split(spark, 2, cands)
    val newUrls = provablyNew.select("url").collect().map(_.getString(0)).toSet
    val seenSet = (round1Urls ++ round2Urls).toSet
    // NO seen url may land in provablyNew (that would corrupt the frontier)
    assert(newUrls.intersect(seenSet).isEmpty, "false negative leaked a seen url")
    // split is a partition of the input
    assert(provablyNew.count() + maybeSeen.count() == cands.count())
    // and it should actually help: most fresh urls bypass the exact join
    assert(newUrls.size > 50, s"filter refined too little: ${newUrls.size}")
  }

  test("crawl with useSeenFilter == crawl without (advisory-only end to end)") {
    import graft.pipeline.{CrawlConfig, Crawler}
    val sim = new graft.fetch.FetchSim(numHosts = 12, pagesPerHost = 6)
    def run(flag: Boolean): Map[String, Long] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sf-$flag").toString
      val c = new Crawler(spark, dir, sim, CrawlConfig(
        numBuckets = 4, perHostBudget = 3, perBucketBudget = 1000,
        useSeenFilter = flag))
      c.addSeeds(sim.seedUrls(10))
      c.round(); c.round(); c.round()
      c.frontier().select("url", "last_visit").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val base = run(false)
    val filtered = run(true)
    assert(filtered == base,
      s"seen-filter changed results: only-f=${filtered.keySet -- base.keySet} " +
        s"only-b=${base.keySet -- filtered.keySet}")
  }

  test("split with no state is fully conservative") {
    import spark.implicits._
    val store = new SeenFilterStore(
      java.nio.file.Files.createTempDirectory("graft-cuckoo2").toString)
    val cands = Frontier.normalizeCandidates(
      Seq(("http://a.test/1", 0, 0L)).toDF("url", "depth", "discovered_at"), 4)
    val (pn, ms) = store.split(spark, 5, cands)
    assert(pn.count() == 0 && ms.count() == 1)
  }
}
