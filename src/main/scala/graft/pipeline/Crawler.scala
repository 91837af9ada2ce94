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

  private def writerOptions: Map[String, String] =
    if (cfg.parquetBlockBytes > 0)
      Map("parquet.block.size" -> cfg.parquetBlockBytes.toString)
    else Map.empty

  /** Frontier table: bucket-granular snapshots, files stored sorted by
    * (host, fifo-priority) so pop streams without sorting. */
  val frontierTable = new IcebergishTable(s"$workDir/frontier", Frontier.schema,
    sortCols = Seq("host", "depth", "discovered_at", "url"),
    writerOptions = writerOptions)
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
    // manifest row count as the cardinality hint — newOnly would otherwise
    // pay a count() scan of the whole table on every re-seed
    val fresh = Frontier.newOnly(existing, cands,
      expectedRows = frontierTable.currentSnapshot().map(_.rows).getOrElse(0L))
    val merged = existing.unionByName(fresh)
    val seedRound = math.max(lastRound, 0)
    val rows = frontierTable.commit(merged, seedRound)
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
    // sorted=true: the committed bucket files are (host, prio)-sorted, so
    // the fifo pop is a streaming take — no Sort node, no exchange
    val popped0 = Frontier.pop(frontier, cfg.sampler, cfg.seed,
      cfg.perHostBudget, cfg.perBucketBudget, cfg.unique, cfg.boost,
      sorted = true)
      .persist()
    // optional per-host token-bucket throttle (worker.go:1238-1253 ready
    // token generalized; north rule): rejected rows stay unvisited in the
    // frontier and are re-offered next round. State is a tiny per-round
    // parquet table — replaying a torn round rereads round r-1's state.
    val popped =
      if (cfg.politenessRate > 0) {
        val prevState = {
          val p = Paths.get(s"$workDir/politeness/round-${r - 1}")
          if (Files.exists(p)) spark.read.parquet(p.toString)
          else graft.streaming.Politeness.emptyState(spark)
        }
        val (admitted, newState) = graft.streaming.Politeness.throttleRound(
          popped0, prevState, r.toLong, cfg.politenessRate, cfg.politenessBurst)
        newState.write.mode(SaveMode.Overwrite)
          .parquet(s"$workDir/politeness/round-$r")
        admitted.persist()
      } else popped0
    // one job: per-bucket lineage counts AND the popped total
    val perBucketCounts = timed("pop")(popped.groupBy("host_bucket").count()
      .collect().map(row => row.getInt(0) -> row.getLong(1)).sortBy(_._1))
    val poppedN = perBucketCounts.map(_._2).sum
    // offered = pool rows the pop stage produced BEFORE the politeness
    // throttle — it distinguishes "frontier exhausted" (stop) from
    // "everything throttled this round" (advance and let tokens refill)
    val offeredN = if (popped ne popped0) popped0.count() else poppedN
    if (offeredN == 0) {
      popped.unpersist()
      if (popped ne popped0) popped0.unpersist()
      return RoundStats(r, 0, 0, 0, 0, math.max(frontierRowsHint, 0L), 0)
    }
    if (poppedN == 0) {
      // throttled to zero: commit an empty delta (every bucket clean) so
      // the snapshot round advances and per-host tokens accrue
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Frontier.schema)
      val rows = frontierTable.commit(empty, r, Some(Set.empty))
      writeLineage(r, Seq.empty, 0, 0, 0, 0, rows)
      popped.unpersist()
      if (popped ne popped0) popped0.unpersist()
      return RoundStats(r, 0, 0, 0, 0, rows, offeredN)
    }

    // --- fetch stage: salted-key shuffle, then per-partition pure fetch ---
    val simB = sim
    val roundB = r
    val storeRoot = if (cfg.storeFiles) s"$workDir/store" else null
    val out = popped
      .withColumn("salt_key",
        concat(col("host"), lit("#"), pmod(xxhash64(col("url")), lit(cfg.saltFactor))))
      .repartition(spark.sparkContext.defaultParallelism * 2, col("salt_key"))
      .select(col("url"), col("depth"))
      .as[(String, Int)]
      .mapPartitions { it =>
        // content-addressed side store (O9/O10): allowlisted bodies gzip'd
        // under bodies/<2ch>/<sha>, screenshot bytes under their media_ref —
        // written DURING the fetch pass like the reference's SaveSession
        // (store/store.go:92-101); writes are idempotent so round replay
        // after a torn commit just re-stores the same keys
        val store = if (storeRoot != null) new graft.sources.FileStore(storeRoot) else null
        it.map { case (url, depth) =>
          val fr = simB.fetch(url)
          val s = Correlate.sessionFromFetch(
            "d" + UrlFns.sha256Hex(url).substring(0, 16), fr)
          if (store != null) {
            fr.bodies.foreach(b => store.storeBody(b.body))
            fr.screenshots.zip(fr.screenshot_bytes).foreach {
              case (ref, bytes) => store.storeScreenshot(ref, bytes)
            }
          }
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
    //     ok/err outcome counters ride the SAME job as Observation metrics
    //     (round 1 paid a separate re-scan job for them).
    val obs = org.apache.spark.sql.Observation(s"round-$r-outcomes")
    timed("fetch+docs")(out.drop("round")
      .observe(obs,
        sum(when(col("error") === "", 1L).otherwise(0L)).as("ok"),
        sum(when(col("error") =!= "", 1L).otherwise(0L)).as("err"))
      .write.mode(SaveMode.Overwrite).options(writerOptions)
      .parquet(s"$docsDir/round=$r"))
    val obsRow = obs.get
    def obsLong(k: String): Long =
      Option(obsRow.getOrElse(k, null)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val fetchedOk = obsLong("ok")
    val errs = obsLong("err")
    val written = spark.read.parquet(s"$docsDir/round=$r")

    // --- frontier expansion (urlStore.Add of Page.DocumentURLs,
    //     worker.go:1247) + visit marks, one atomic bucket-selective
    //     commit. Candidates stay RAW (dedup=false): mergeRound's single
    //     aggregation dedups them with identical min-struct semantics,
    //     saving one full candidate exchange per round.
    val rawNew = written
      .select(col("depth"), posexplode(col("links")).as(Seq("pos", "url")))
      .select(col("url"), (col("depth") + 1).as("depth"),
        (lit(r.toLong * 1000000L) + col("pos")).as("discovered_at"))
    val cands0 = Frontier.normalizeCandidates(rawNew, cfg.numBuckets,
      cfg.respectRobots, dedup = cfg.useSeenFilter)
    // dirty buckets = buckets with pops or new candidates; ONLY their
    // frontier rows enter the merge shuffle and ONLY their files are
    // rewritten — per-round frontier I/O is O(touched), not O(pool).
    // DENSE shortcut: when the popped buckets already cover every manifest
    // bucket, everything is dirty — skip the candidate-bucket scan (it was
    // a near-serial extra pass; new buckets a candidate opens are adopted
    // by the commit regardless, they have no old rows to lose).
    val allBuckets = frontierTable.currentSnapshot().map(_.buckets.keySet).getOrElse(Set.empty)
    val poppedBuckets = perBucketCounts.map(_._1).toSet
    val dense = allBuckets.nonEmpty && allBuckets.subsetOf(poppedBuckets)
    // persist only when consumed more than once (sparse path's distinct
    // job, or the seen-filter's split + update passes)
    val multiPass = !dense || cfg.useSeenFilter
    val cands = if (multiPass) cands0.persist() else cands0
    val dirty =
      if (dense) poppedBuckets
      else timed("cand-buckets")(
        cands.select("host_bucket").distinct().collect().map(_.getInt(0)).toSet) ++
        poppedBuckets
    val frontierDirty =
      if (dense) frontier
      else frontier.filter(col("host_bucket").isin(dirty.toSeq.map(Int.box): _*))
    // optional per-partition cuckoo refinement (north rule): provably-new
    // candidates bypass the exact merge aggregation; correctness never
    // depends on it (advisory only — see SeenFilterStore)
    // mergeRound's output is already bucket-hash-partitioned — the commit
    // reuses that exchange (preClustered) unless the seen-filter union
    // broke it
    val merged =
      if (cfg.useSeenFilter) {
        val (provablyNew, maybeSeen) = seenFilters.split(spark, r - 1, cands)
        Frontier.mergeRound(frontierDirty, maybeSeen, popped, r).unionByName(provablyNew)
      } else Frontier.mergeRound(frontierDirty, cands, popped, r)
    val frontierRows = timed("commit")(frontierTable.commit(merged, r, Some(dirty),
      preClustered = !cfg.useSeenFilter))
    if (cfg.useSeenFilter)
      seenFilters.updateAndSave(spark, r, r - 1, cands, frontierTable.read(spark))
    if (multiPass) cands.unpersist()
    val newN = math.max(0L, frontierRows - math.max(frontierRowsHint, 0L))

    writeLineage(r, perBucketCounts, poppedN, fetchedOk, errs, newN, frontierRows)
    popped.unpersist()
    if (popped ne popped0) popped0.unpersist()
    RoundStats(r, poppedN, fetchedOk, errs, newN, frontierRows, offeredN)
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
    * worker_test.go:493-583): rounds until the POOL is empty — a round
    * where politeness throttled every offer still advances (tokens
    * refill); only an empty offer set terminates. */
  def crawlUntilEmpty(maxRounds: Int = 1000): Seq[RoundStats] = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var i = 0
    var done = false
    while (i < maxRounds && !done) {
      val s = round()
      if (s.offered == 0) done = true else stats += s
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
    useSeenFilter: Boolean = false,
    /** Per-host token-bucket throttle (fetch slots earned per round /
      * bucket cap); 0 disables. Rejected pops stay queued. */
    politenessRate: Double = 0.0,
    politenessBurst: Double = 1.0,
    /** Physical content-addressed body/screenshot store (O9/O10) — on by
      * default like the reference; benches that isolate the frontier
      * metric turn it off explicitly. */
    storeFiles: Boolean = true,
    /** `parquet.block.size` for docs/frontier writes; 0 = parquet default
      * (128 MB — right for object storage at the 10^10 design point, but a
      * per-writer-task heap buffer at local[32]: 64 concurrent writers ×
      * 128 MB would out-size the whole young gen. Benches set ~16 MB). */
    parquetBlockBytes: Long = 0L)

case class RoundStats(
    round: Int,
    popped: Long,
    fetchedOk: Long,
    errors: Long,
    newUrls: Long,
    frontierRows: Long,
    /** pool rows offered by pop BEFORE the politeness throttle; 0 ⇔ the
      * frontier is exhausted (the crawl-closure condition). */
    offered: Long = -1)
