package graft.pipeline

import graft.fetch.{Correlate, FetchSim}
import graft.frontier.Frontier
import graft.functions.UrlFns
import graft.model.Model._
import graft.sources.IcebergishTable
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * The crawl pipeline — kraaler's `krl run` steady state
 * (/root/reference/app/cmd/run.go:46-159 + worker.go:1224-1296) as a
 * sequence of deterministic micro-batch "fetch rounds":
 *
 *   pop(budget) → salted-shuffle fetch (mapPartitions) → correlate →
 *   docs append → frontier expand (dedup) + visit marks → atomic commit →
 *   lineage metrics.
 *
 * One round = one micro-batch (the reference's analogue is the
 * 1-token-per-worker ready loop, worker.go:1238-1253; our budget is
 * per-host × per-bucket instead of per-worker). Everything is replayable:
 * a torn round leaves the frontier manifest un-bumped, and round N's docs
 * partition is overwritten when N is re-run (idempotent replay — the
 * SQLite-transaction analogue of store/store.go:69-105).
 *
 * Scale design (10^10 frontier / 1000 executors):
 *  - the fetch shuffle keys on `host#salt` — host affinity for politeness
 *    and DNS-cache locality (worker.go:117) but hot hosts split across
 *    `saltFactor` partitions (north rule: explicit skew handling);
 *  - docs are append-only round-partitioned parquet — never rewritten;
 *  - the frontier rewrite is the only full-table pass; see
 *    [[IcebergishTable]] for the MERGE-INTO swap point;
 *  - nothing collects rows to the driver except ≤P lineage counters.
 */
class Crawler(
    spark: SparkSession,
    workDir: String,
    sim: FetchSim,
    cfg: CrawlConfig) {

  import spark.implicits._

  val frontierTable = new IcebergishTable(s"$workDir/frontier", Frontier.schema)
  val seenFilters = new graft.frontier.SeenFilterStore(workDir)
  private def docsDir = s"$workDir/docs"

  def lastRound: Int = frontierTable.currentSnapshot().map(_.round).getOrElse(-1)

  def docIdOf(url: String): String = "d" + UrlFns.sha256Hex(url).substring(0, 16)

  /** Seed the frontier (round 0 commit). Seeds are depth 0, discovery order
    * = list order (ReadDomainsFromFile semantics, kraaler.go:29-57). */
  def addSeeds(urls: Seq[String]): Long =
    addSeedCandidates(urls.zipWithIndex.toDF("url", "pos")
      .select(col("url"), lit(0).as("depth"), col("pos").cast("long").as("discovered_at")))

  /** Distributed seeding: `raw` has (url, depth, discovered_at) and can be
    * any size — 10^10-scale seed lists never pass through the driver. */
  def addSeedCandidates(raw: DataFrame): Long = {
    val cands = Frontier.normalizeCandidates(raw, cfg.numBuckets, cfg.respectRobots)
    val existing = frontierTable.read(spark)
    val fresh = Frontier.newOnly(existing, cands)
    val merged = existing.unionByName(fresh)
    val seedRound = math.max(lastRound, 0)
    val rows = frontierTable.commit(merged, seedRound, Seq("host_bucket"))
    if (cfg.useSeenFilter)
      seenFilters.updateAndSave(spark, seedRound, seedRound, cands, frontierTable.read(spark))
    rows
  }

  private val timing = sys.env.contains("GRAFT_ROUND_TIMING")
  private def timed[T](label: String)(f: => T): T = {
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val v = f
      System.err.println(f"[round-timing] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      v
    }
  }

  /** Run one fetch round; returns stats (popped==0 ⇒ frontier exhausted). */
  def round(): RoundStats = {
    val r = lastRound + 1
    val frontierRowsHint = frontierTable.currentSnapshot().map(_.rows).getOrElse(-1L)
    val frontier = frontierTable.read(spark)
    val popped = Frontier.pop(frontier, cfg.sampler, cfg.seed,
      cfg.perHostBudget, cfg.perBucketBudget, cfg.unique, cfg.boost)
      .persist()
    // one job: per-bucket lineage counts AND the popped total
    val perBucketCounts = timed("pop")(popped.groupBy("host_bucket").count()
      .collect().map(row => row.getInt(0) -> row.getLong(1)).sortBy(_._1))
    val poppedN = perBucketCounts.map(_._2).sum
    if (poppedN == 0) { popped.unpersist(); return RoundStats(r, 0, 0, 0, 0, frontier.count()) }

    // --- fetch stage: salted-key shuffle, then per-partition pure fetch ---
    val simB = sim
    val roundB = r
    val out = popped
      .withColumn("salt_key",
        concat(col("host"), lit("#"), pmod(xxhash64(col("url")), lit(cfg.saltFactor))))
      .repartition(spark.sparkContext.defaultParallelism * 4, col("salt_key"))
      .select(col("url"), col("depth"))
      .as[(String, Int)]
      .mapPartitions { it =>
        it.map { case (url, depth) =>
          val fr = simB.fetch(url)
          val s = Correlate.sessionFromFetch(
            "d" + UrlFns.sha256Hex(url).substring(0, 16), fr)
          val doc = Correlate.docFromSession(s)
          CrawlOut(doc.doc_id, url, s.host, depth, roundB,
            doc.spans, s.links, s.error,
            s.navigate_ts, s.loaded_ts, s.terminated_ts)
        }
      }

    // --- sink: ONE wide round file (spans + session metadata + links).
    //     The fetch output is written exactly once — no cache build, no
    //     second pass over the fat spans column; downstream consumers
    //     (session stats, frontier expansion) read back with column
    //     pruning and never touch `spans`. `round` lives only in the
    //     partition dir (dropped from data to avoid the dup-column clash).
    timed("fetch+docs")(out.drop("round")
      .write.mode(SaveMode.Overwrite).parquet(s"$docsDir/round=$r"))
    val written = spark.read.parquet(s"$docsDir/round=$r")

    // one job for both outcome counters (reads only the `error` column)
    val okErr = timed("ok-err")(written.agg(
      sum(when(col("error") === "", 1L).otherwise(0L)),
      sum(when(col("error") =!= "", 1L).otherwise(0L))).collect()(0))
    val fetchedOk = if (okErr.isNullAt(0)) 0L else okErr.getLong(0)
    val errs = if (okErr.isNullAt(1)) 0L else okErr.getLong(1)

    // --- frontier expansion (urlStore.Add of Page.DocumentURLs,
    //     worker.go:1247) + visit marks, one atomic commit ---
    val rawNew = written
      .select(col("depth"), posexplode(col("links")).as(Seq("pos", "url")))
      .select(col("url"), (col("depth") + 1).as("depth"),
        (lit(r.toLong * 1000000L) + col("pos")).as("discovered_at"))
    val cands = Frontier.normalizeCandidates(rawNew, cfg.numBuckets, cfg.respectRobots)
    // optional per-partition cuckoo refinement (north rule): provably-new
    // candidates bypass the exact merge join; correctness never depends on
    // it (advisory only — see SeenFilterStore)
    val merged =
      if (cfg.useSeenFilter) {
        val (provablyNew, maybeSeen) = seenFilters.split(spark, r - 1, cands)
        Frontier.mergeRound(frontier, maybeSeen, popped, r).unionByName(provablyNew)
      } else Frontier.mergeRound(frontier, cands, popped, r)
    val frontierRows = timed("commit")(frontierTable.commit(merged, r, Seq("host_bucket")))
    if (cfg.useSeenFilter)
      seenFilters.updateAndSave(spark, r, r - 1, cands, frontierTable.read(spark))
    val newN = math.max(0L, frontierRows - math.max(frontierRowsHint, 0L))

    writeLineage(r, perBucketCounts, poppedN, fetchedOk, errs, newN, frontierRows)
    popped.unpersist()
    RoundStats(r, poppedN, fetchedOk, errs, newN, frontierRows)
  }

  /** Per-round, per-partition lineage metrics (north rule: "checkpoints
    * frontier + seen-set state per partition with lineage metrics"). */
  private def writeLineage(r: Int, perBucketCounts: Seq[(Int, Long)], poppedN: Long,
      ok: Long, errs: Long, newN: Long, frontierRows: Long): Unit = {
    val perBucket = perBucketCounts
      .map { case (b, c) => s""""$b":$c""" }.mkString("{", ",", "}")
    Files.createDirectories(Paths.get(s"$workDir/lineage"))
    Files.writeString(Paths.get(s"$workDir/lineage/round-$r.json"),
      s"""{"round":$r,"popped":$poppedN,"fetched_ok":$ok,"errors":$errs,""" +
        s""""new_urls":$newN,"frontier_rows":$frontierRows,""" +
        s""""popped_per_bucket":$perBucket}""")
  }

  /** Crawl to closure (TestWorkerController semantics,
    * worker_test.go:493-583): rounds until the pool is empty. */
  def crawlUntilEmpty(maxRounds: Int = 1000): Seq[RoundStats] = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var i = 0
    var done = false
    while (i < maxRounds && !done) {
      val s = round()
      if (s.popped == 0) done = true else stats += s
      i += 1
    }
    stats.toSeq
  }

  /** All committed wide round rows (torn rounds excluded by the manifest
    * round). */
  def docsWide(): DataFrame = {
    val r = lastRound
    if (r < 1 || !Files.exists(Paths.get(docsDir)))
      return spark.emptyDataFrame
    spark.read.parquet(docsDir).filter(col("round") <= r)
  }

  /** The `input_hint`-shaped docs table (doc_id, spans [, round]). */
  def docs(): DataFrame = {
    val w = docsWide()
    if (w.columns.isEmpty) w else w.select("doc_id", "spans", "round")
  }

  /** Session metadata view — a pruned projection of the wide round files
    * (never touches the spans column). */
  def sessions(): DataFrame =
    docsWide().select("doc_id", "url", "host", "depth", "error",
      "navigate_ts", "loaded_ts", "terminated_ts", "round")

  def frontier(): DataFrame = frontierTable.read(spark)
}

case class CrawlConfig(
    numBuckets: Int = 32,
    perHostBudget: Int = 4,
    perBucketBudget: Int = 1000,
    sampler: String = "fifo",
    seed: Long = 42L,
    unique: Boolean = true,
    saltFactor: Int = 8,
    boost: Double = 2000.0,
    respectRobots: Boolean = false,
    useSeenFilter: Boolean = false)

case class RoundStats(
    round: Int,
    popped: Long,
    fetchedOk: Long,
    errors: Long,
    newUrls: Long,
    frontierRows: Long)
