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
  private def docsDir = s"$workDir/docs"
  private def sessionsDir = s"$workDir/sessions"

  def lastRound: Int = frontierTable.currentSnapshot().map(_.round).getOrElse(-1)

  def docIdOf(url: String): String = "d" + UrlFns.sha256Hex(url).substring(0, 16)

  /** Seed the frontier (round 0 commit). Seeds are depth 0, discovery order
    * = list order (ReadDomainsFromFile semantics, kraaler.go:29-57). */
  def addSeeds(urls: Seq[String]): Long = {
    val raw = urls.zipWithIndex.toDF("url", "pos")
      .select(col("url"), lit(0).as("depth"), col("pos").cast("long").as("discovered_at"))
    val cands = Frontier.normalizeCandidates(raw, cfg.numBuckets)
    val existing = frontierTable.read(spark)
    val fresh = Frontier.newOnly(existing, cands)
    val merged = existing.unionByName(fresh)
    frontierTable.commit(merged, math.max(lastRound, 0), Seq("host_bucket"))
  }

  /** Run one fetch round; returns stats (popped==0 ⇒ frontier exhausted). */
  def round(): RoundStats = {
    val r = lastRound + 1
    val frontier = frontierTable.read(spark)
    val popped = Frontier.pop(frontier, cfg.sampler, cfg.seed,
      cfg.perHostBudget, cfg.perBucketBudget, cfg.unique, cfg.boost)
      .persist()
    val poppedN = popped.count()
    if (poppedN == 0) { popped.unpersist(); return RoundStats(r, 0, 0, 0, 0, frontier.count()) }

    // --- fetch stage: salted-key shuffle, then per-partition pure fetch ---
    val simB = sim
    val roundB = r
    val out = popped
      .withColumn("salt_key",
        concat(col("host"), lit("#"), pmod(xxhash64(col("url")), lit(cfg.saltFactor))))
      .repartition(spark.sparkContext.defaultParallelism, col("salt_key"))
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
      .persist()

    // --- sinks: docs (input_hint shape) + sessions side table, idempotent
    //     per-round overwrite ---
    out.select("doc_id", "spans")
      .write.mode(SaveMode.Overwrite).parquet(s"$docsDir/round=$r")
    out.select("doc_id", "url", "host", "depth", "error",
        "navigate_ts", "loaded_ts", "terminated_ts")
      .write.mode(SaveMode.Overwrite).parquet(s"$sessionsDir/round=$r")

    val fetchedOk = out.filter(col("error") === "").count()
    val errs = out.filter(col("error") =!= "").count()

    // --- frontier expansion (urlStore.Add of Page.DocumentURLs,
    //     worker.go:1247) + visit marks, one atomic commit ---
    val rawNew = out
      .select(col("depth"), posexplode(col("links")).as(Seq("pos", "url")))
      .select(col("url"), (col("depth") + 1).as("depth"),
        (lit(r.toLong * 1000000L) + col("pos")).as("discovered_at"))
    val cands = Frontier.normalizeCandidates(rawNew, cfg.numBuckets)
    val fresh = Frontier.newOnly(frontier, cands).persist()
    val newN = fresh.count()
    val marked = Frontier.markVisited(frontier, popped, r)
    val merged = marked.unionByName(fresh)
    val frontierRows = frontierTable.commit(merged, r, Seq("host_bucket"))

    writeLineage(r, popped, poppedN, fetchedOk, errs, newN, frontierRows)
    popped.unpersist(); out.unpersist(); fresh.unpersist()
    RoundStats(r, poppedN, fetchedOk, errs, newN, frontierRows)
  }

  /** Per-round, per-partition lineage metrics (north rule: "checkpoints
    * frontier + seen-set state per partition with lineage metrics"). */
  private def writeLineage(r: Int, popped: DataFrame, poppedN: Long,
      ok: Long, errs: Long, newN: Long, frontierRows: Long): Unit = {
    val perBucket = popped.groupBy("host_bucket").count()
      .collect().sortBy(_.getInt(0))
      .map(row => s""""${row.getInt(0)}":${row.getLong(1)}""").mkString("{", ",", "}")
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

  /** All committed docs (torn rounds excluded by the manifest round). */
  def docs(): DataFrame = {
    val r = lastRound
    if (r < 1 || !Files.exists(Paths.get(docsDir)))
      return spark.emptyDataFrame
    spark.read.parquet(docsDir).filter(col("round") <= r)
  }

  def sessions(): DataFrame = {
    val r = lastRound
    if (r < 1 || !Files.exists(Paths.get(sessionsDir)))
      return spark.emptyDataFrame
    spark.read.parquet(sessionsDir).filter(col("round") <= r)
  }

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
    boost: Double = 2000.0)

case class RoundStats(
    round: Int,
    popped: Long,
    fetchedOk: Long,
    errors: Long,
    newUrls: Long,
    frontierRows: Long)
