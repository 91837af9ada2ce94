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
 *  - the frontier is SPLIT: the live pool (unvisited queue) is the only
 *    table rewritten per round, and popped rows leave it for an
 *    append-only seen archive the round they are fetched — per-round
 *    write I/O is O(pool + delta), never O(ever-seen) (at 10^10 the
 *    ever-seen set dwarfs the live pool); see [[IcebergishTable]] for
 *    the MERGE-INTO swap point. The archive never re-enters the merge
 *    SHUFFLE either: re-discovered archived urls are dropped by an exact
 *    partition-local membership probe over the bucket's own archive
 *    slice ([[graft.frontier.SeenIndex]]) — per-round shuffle volume is
 *    likewise O(pool + delta), never O(ever-seen);
 *  - nothing collects rows to the driver except ≤P lineage counters.
 */
class Crawler(
    spark: SparkSession,
    workDir: String,
    sim: FetchSim,
    cfg: CrawlConfig) {

  import spark.implicits._

  // Dictionary encoding is off for EVERY crawl-path write (docs, seen
  // archive, frontier): the heavy columns (url, spans JSON, links,
  // doc_id) are near-unique, so parquet's per-page dictionary attempt is
  // wasted encode CPU that then FALLS BACK anyway (JFR r4: the dictionary
  // hash probing/rehash + binary compares were the largest attributable
  // share of the docs-write encoder). The genuinely repetitive columns
  // (host, error="") still compress away under the file-level zstd.
  //
  // Min/max column statistics are likewise off for the fat/unique binary
  // columns (span text payloads, link urls, url, doc_id): stats exist to
  // power predicate pushdown, and no crawl-path read filters on these —
  // docs prune by the round partition dir, frontier/seen reads are
  // per-bucket FILE selections — while computing them costs a
  // lexicographic compare of every multi-KB value against the running
  // min/max (visible in the JFR write profile). Row counts (manifest) and
  // stats on the small scheduling columns (depth, discovered_at) stay.
  private def writerOptions: Map[String, String] =
    Map("parquet.enable.dictionary" -> "false",
      "parquet.column.statistics.enabled#spans.list.element.text" -> "false",
      "parquet.column.statistics.enabled#links.list.element" -> "false",
      "parquet.column.statistics.enabled#url" -> "false",
      "parquet.column.statistics.enabled#doc_id" -> "false") ++
      (if (cfg.parquetBlockBytes > 0)
        Map("parquet.block.size" -> cfg.parquetBlockBytes.toString)
      else Map.empty)

  /** Frontier POOL table — the unvisited queue only: bucket-granular
    * snapshots, files stored sorted by (host, fifo-priority) so pop
    * streams without sorting. Visited rows LEAVE this table for the
    * append-only [[seen]] archive the round they are popped, so the
    * per-round rewrite is O(pool + delta), never O(ever-seen) — at the
    * 10^10 design point the ever-seen set dwarfs the live pool and
    * rewriting it every round was the unbounded term (round 3).
    *
    * The files are SLIM (r4): `host`/`host_bucket`/`last_visit` are
    * derivable (pure functions of url / constant 0) and are dropped at
    * write, restored at read ([[Frontier.restorePool]]) — the rewrite is
    * the round's least-scaling stage (sort + encode + fresh-page commits
    * are byte-proportional), so every derivable byte is paid for twice
    * per round for nothing. Dictionary encoding is off for these files:
    * urls are near-unique per bucket, so parquet's per-page dictionary
    * attempt is pure wasted encode CPU. */
  val frontierTable = new IcebergishTable(s"$workDir/frontier", Frontier.schema,
    sortCols = Seq("host", "depth", "discovered_at", "url"),
    writerOptions = writerOptions ++
      (if (cfg.frontierCodec.nonEmpty) Map("compression" -> cfg.frontierCodec)
       else Map.empty),
    dropCols = Seq("host", "host_bucket", "last_visit"))

  /** Delta-pool (LSM) mode: rounds append per-bucket delta files instead
    * of rewriting the base, compacting every `poolDeltaRounds` rounds. Only
    * meaningful for the unique-fifo regime (the steady-state crawl); other
    * samplers need the visited rows in view and keep the classic rewrite. */
  private val deltaModeActive = cfg.poolDeltaRounds > 1
  if (deltaModeActive)
    require(cfg.unique && cfg.sampler == "fifo" && !cfg.useSeenFilter,
      s"poolDeltaRounds=${cfg.poolDeltaRounds} requires unique=true, sampler=fifo, " +
        "useSeenFilter=false (classic rewrite covers the other regimes)")

  /** The pool with derived columns restored — every consumer of the
    * frontier table reads THIS view. In delta mode, popped rows leave the
    * pool LOGICALLY: their stale base-file rows are dropped here against
    * the seen archive (Iceberg delete-file semantics) instead of via the
    * per-round physical rewrite. */
  private def poolView: DataFrame = {
    val raw = Frontier.restorePool(frontierTable.read(spark), cfg.numBuckets)
    // stale (popped-but-not-compacted) rows exist only when rounds have
    // popped since the last full commit — right after a compaction the
    // base files are stale-free and the per-row probe is skipped entirely
    val stale = deltaModeActive &&
      frontierTable.currentSnapshot().exists(s => s.compactRound < s.round)
    if (!stale) raw
    else raw.filter(!graft.functions.GraftExpressions.seen_index_contains_at(
      col("url"), col("host_bucket"), seenDir, lastRound))
  }
  val seenFilters = new graft.frontier.SeenFilterStore(workDir)

  /** Politeness state past this many hosts falls back to the window form
    * (the broadcast map and the driver-resident cache share the bound). */
  private val broadcastStateMax = 20000000

  /** Driver-resident politeness state (r4): the map round r needs is the
    * one round r-1 just computed — re-reading the state parquet and
    * re-collecting it every round cost two driver-latency jobs at the
    * round HEAD, a fixed per-round cost the N→4N gate punishes on the
    * fast side. Keyed by the round that wrote it; parquet stays the
    * durable copy (resume and torn-round replay read it — Thread.join
    * before the manifest rename orders the write before any reader). */
  private var politenessCache: Option[(Int, java.util.HashMap[String, (Double, Long)])] = None
  private def docsDir = s"$workDir/docs"
  private def seenDir = s"$workDir/seen"

  def lastRound: Int = frontierTable.currentSnapshot().map(_.round).getOrElse(-1)

  /** Committed archive rounds, with the `round` partition column; the
    * explicit schema (a) skips footer-based inference and (b) makes an
    * empty/torn archive dir read as zero rows instead of failing.
    *
    * Archive data files are SLIM like the pool's (r4): they store only
    * (url, depth, discovered_at) — `host` is a pure function of url,
    * `host_bucket` is the partition dir, and `last_visit` is ALWAYS the
    * round the row was archived, i.e. the `round` partition value (a
    * re-visit under unique=false appends a new row in ITS round dir, so
    * the equality holds per row in every regime). The archive write is
    * one of the three byte-proportional per-round writes; every derivable
    * byte costs fixed ~200 MB/s page-commit time on this host and object
    * -store puts at the design point. */
  private def seenWithRound: DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    if (!Files.exists(Paths.get(seenDir)))
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Frontier.schema)
        .withColumn("round", lit(0))
    graft.functions.GraftExpressions.register(spark)
    val fileSchema = StructType(
      Frontier.schema.filter(f => Seq("url", "depth", "discovered_at").contains(f.name)) ++
        Seq(StructField("host_bucket", IntegerType), StructField("round", IntegerType)))
    spark.read
      .schema(fileSchema)
      .parquet(seenDir)
      .filter(col("round") <= lastRound)
      .select(col("url"),
        graft.functions.GraftExpressions.url_host(col("url")).as("host"),
        col("host_bucket"), col("depth"), col("discovered_at"),
        col("round").cast("long").as("last_visit"), col("round"))
  }

  /** Cumulative archive row count (popped totals); recovered on resume
    * with one count over committed archive rounds. */
  private var seenRows: Long =
    if (!Files.exists(Paths.get(seenDir))) 0L else seenWithRound.count()

  /** The ever-visited archive (url, host, host_bucket, depth,
    * discovered_at, last_visit) — one immutable round dir per round,
    * written straight from the popped cache (no shuffle), never rewritten.
    * Torn rounds are excluded by the manifest round, like docs. */
  def seen(): DataFrame =
    seenWithRound.drop("round")
      .select(Frontier.schema.fieldNames.map(col).toIndexedSeq: _*)

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
    val pool = poolView
    // the seen-set check is against EVERYTHING ever seen: live pool +
    // archive. Manifest row count + archive counter as the cardinality
    // hint — newOnly would otherwise pay a count() scan on every re-seed.
    val fresh = Frontier.newOnly(pool.unionByName(seen()), cands,
      expectedRows =
        frontierTable.currentSnapshot().map(_.rows).getOrElse(0L) + seenRows)
    // only the POOL is rewritten; archived rows never re-enter it
    val merged = pool.unionByName(fresh)
    val seedRound = math.max(lastRound, 0)
    // a re-seed REWRITES the manifest at the same round (and compacts any
    // live deltas) — drop the pool index's cached snapshot of that round
    // (single-JVM; on a cluster the stale-base loud check in PoolIndex
    // catches it)
    if (deltaModeActive) graft.frontier.PoolIndex.invalidate()
    val rows = frontierTable.commit(merged, seedRound)
    if (cfg.useSeenFilter)
      seenFilters.updateAndSave(spark, seedRound, seedRound, cands, frontier())
    rows + seenRows
  }

  private val timing = sys.env.contains("GRAFT_ROUND_TIMING")
  /** Recursive delete of an uncommitted round artifact (no-op if absent). */
  private def deleteDir(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      // close the listing stream eagerly — each Files.list holds an open
      // directory fd until closed (GC-reliant release leaks fds across a
      // deep recursive delete)
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) deleteDir(it.next())
      } finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }

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
    val poolRowsHint = frontierTable.currentSnapshot().map(_.rows).getOrElse(0L)
    val frontierRowsHint = poolRowsHint + seenRows
    val pool = poolView
    // the POOL is exactly the unvisited queue — fifo/uniform pops read it
    // alone (the seen archive never re-enters the pop path); only the
    // pair sampler (visit-count weights) and unique=false re-pops need
    // archived rows in view
    val popSource =
      if (cfg.unique && cfg.sampler != "pair") pool
      else pool.unionByName(seen())
    // optional per-host token-bucket throttle (worker.go:1238-1253 ready
    // token generalized; north rule): rejected rows stay unvisited in the
    // frontier and are re-offered next round. State is a tiny per-round
    // parquet table — replaying a torn round rereads round r-1's state.
    // ONE round-sized cache either way: ungated rounds cache the pop
    // output; gated rounds cache the pop output WITH its admission flag
    // and treat `popped` as a filter view over that cache.
    val gated = cfg.politenessRate > 0
    // driver-resident fast path: the cache holds exactly what round r-1's
    // state write produced; when it misses (fresh instance, resume, an
    // exhausted round that wrote no state) the parquet path below is the
    // fallback — identical content by construction.
    val cachedStateMap =
      if (gated) politenessCache.collect { case (pr, m) if pr == r - 1 => m }
      else None
    val prevState =
      if (!gated || cachedStateMap.isDefined) null
      else {
        val p = Paths.get(s"$workDir/politeness/round-${r - 1}")
        if (Files.exists(p)) spark.read.parquet(p.toString)
        else graft.streaming.Politeness.emptyState(spark)
      }
    // sorted=true: the committed bucket files are (host, prio)-sorted, so
    // the fifo pop is a streaming take — no Sort node, no exchange. The
    // GATED fifo round fuses the token-bucket verdict INTO that same
    // streaming pass (popSortedFifoFlagged): zero extra passes over the
    // offer, identical verdicts (see its scaladoc). Non-fifo samplers
    // flag in a separate partition-local pass; past `broadcastStateMax`
    // hosts both fall back to the window form.
    val sortedFifo = cfg.unique && cfg.sampler == "fifo"
    def popPlain() = Frontier.pop(popSource, cfg.sampler, cfg.seed,
      cfg.perHostBudget, cfg.perBucketBudget, cfg.unique, cfg.boost,
      sorted = true)
    val stateMap =
      if (!gated) None
      else cachedStateMap.orElse(
        graft.streaming.Politeness.stateMapOf(prevState, broadcastStateMax))
    // Delta-pool pop: a bucket's live rows span SEVERAL sorted files (base
    // + per-round deltas), so the pop is the two-stage form — per-file
    // streaming prefixes, then ONE O(popped + delta) exchange onto the
    // balanced bucket token and the same fused walker. Used for EVERY
    // round in delta mode (deltas may be live even on compaction rounds).
    // per-host admitted counts ride the fused pop walker as an accumulator
    // side output (idempotent by partition), replacing the separate
    // cache-scan + shuffle job the state write used to run — a 5-7 s/round
    // fixed cost at local[32] once the delta commit stopped masking it
    val admitAcc =
      if (gated && stateMap.isDefined && (sortedFifo || deltaModeActive)) {
        val a = new graft.streaming.Politeness.AdmittedCountsAcc()
        spark.sparkContext.register(a, s"admitted-hosts-r$r")
        Some(a)
      } else None
    def popDelta(st: Option[org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, (Double, Long)]]]) =
      Frontier.popSortedFifoDeltaFlagged(
        Frontier.popDeltaScan(popSource, cfg.perHostBudget),
        cfg.numBuckets, cfg.perHostBudget, cfg.perBucketBudget,
        st, r.toLong, cfg.politenessRate, cfg.politenessBurst, admitAcc)
    // right after a compaction every bucket is ONE sorted file again — the
    // classic single-pass fused pop applies and the two-stage form (extra
    // exchange + sort) is skipped for that round
    val deltasLive = frontierTable.currentSnapshot().exists(s => s.compactRound < s.round)
    val cached = (
      if (deltaModeActive && deltasLive) {
        if (!gated) popDelta(None).drop("admit")
        else stateMap match {
          case Some(m) => popDelta(Some(spark.sparkContext.broadcast(m)))
          case None =>
            graft.streaming.Politeness.flagAdmissionsWindow(
              popDelta(None).drop("admit"), prevState, r.toLong,
              cfg.politenessRate, cfg.politenessBurst)
        }
      } else if (!gated) popPlain()
      else stateMap match {
        case Some(m) if sortedFifo =>
          Frontier.popSortedFifoFlagged(popSource, cfg.perHostBudget,
            cfg.perBucketBudget, spark.sparkContext.broadcast(m), r.toLong,
            cfg.politenessRate, cfg.politenessBurst, admitAcc)
        case Some(m) =>
          graft.streaming.Politeness.flagAdmissionsWithMap(
            popPlain(), m, r.toLong, cfg.politenessRate, cfg.politenessBurst)
        case None =>
          graft.streaming.Politeness.flagAdmissionsWindow(
            popPlain(), prevState, r.toLong, cfg.politenessRate, cfg.politenessBurst)
      }).persist()
    val popped = if (gated) cached.filter(col("admit")).drop("admit") else cached

    // --- per-bucket lineage counts RIDE the docs-write job ---
    // The round-2 shape paid a SEPARATE round-sized aggregation job here
    // just to collect per-bucket pop counts (and, gated, the offered/
    // admitted split) before the fetch — a full pop pass per round of
    // pure fixed cost, exactly the non-scaling term the N→4N metric
    // punishes. The counts are now an Observation on the cached pop
    // output inside the SAME job that fetches and writes docs
    // (`bucket_counts` — a single O(numBuckets) typed aggregate, see
    // GraftExpressions). The cache materializes during that job; the
    // overlapped archive/state writes below start AFTER it, so nothing
    // ever computes the pop twice.
    graft.functions.GraftExpressions.register(spark)
    val obsCounts = org.apache.spark.sql.Observation(s"round-$r-counts")
    val nb = cfg.numBuckets
    import graft.functions.GraftExpressions.bucket_counts
    val observedPop =
      if (gated)
        cached.observe(obsCounts,
          bucket_counts(col("host_bucket"), nb).as("offered_pb"),
          bucket_counts(when(col("admit"), col("host_bucket")), nb).as("admitted_pb"))
          .filter(col("admit")).drop("admit")
      else
        cached.observe(obsCounts, bucket_counts(col("host_bucket"), nb).as("offered_pb"))

    // --- fetch stage: per-partition pure fetch, in place by default ---
    // The pop output is ALREADY host-clustered and balanced: bucket files
    // cluster by hash(host), and the per-host budget bounds any host at
    // `perHostBudget` rows/round, so the worst bucket partition is
    // hosts-per-bucket × budget (± hash Poisson noise) — fetching in place
    // keeps host affinity (politeness, DNS-cache locality, worker.go:117)
    // with ZERO shuffle. `saltFactor > 0` opts into the salted-key shuffle
    // for regimes where one host's round share is unbounded (huge per-host
    // budgets, unique=false re-pops — north rule: explicit skew handling);
    // there `host#salt` splits a hot host across saltFactor partitions.
    val simB = sim
    val roundB = r
    val storeRoot = if (cfg.storeFiles) s"$workDir/store" else null
    val fetchInput =
      if (cfg.saltFactor > 0)
        observedPop
          .withColumn("salt_key",
            concat(col("host"), lit("#"), pmod(xxhash64(col("url")), lit(cfg.saltFactor))))
          .repartition(spark.sparkContext.defaultParallelism * 2, col("salt_key"))
      else observedPop
    val out = fetchInput
      .select(col("url"), col("depth"))
      .as[(String, Int)]
      .mapPartitions { it =>
        // content-addressed side store (O9/O10): allowlisted bodies gzip'd
        // under bodies/<2ch>/<sha>, screenshot bytes under their media_ref —
        // written DURING the fetch pass like the reference's SaveSession
        // (store/store.go:92-101); writes are idempotent so round replay
        // after a torn commit just re-stores the same keys
        val store = if (storeRoot != null) new graft.sources.FileStore(storeRoot) else null
        // one render buffer per partition: docFromSession appends every
        // span payload into it (JSON combinators measured ~10% of bench
        // CPU / ~25% of allocation at local[32] — JFR, round 4)
        val sb = new java.lang.StringBuilder(1 << 14)
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
          val doc = Correlate.docFromSession(s, sb)
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

    // --- counts from the ride-along observation (see above) ---
    val countsRow = obsCounts.get
    def pbArr(k: String): IndexedSeq[Long] =
      countsRow.getOrElse(k, null) match {
        case null => IndexedSeq.empty
        case s: scala.collection.Seq[_] => s.map(_.asInstanceOf[Long]).toIndexedSeq
        case a: Array[Long] => a.toIndexedSeq
      }
    val offeredPb = pbArr("offered_pb")
    val admittedPb = if (gated) pbArr("admitted_pb") else offeredPb
    val offeredN = offeredPb.sum
    val perBucketCounts: Seq[(Int, Long)] =
      admittedPb.zipWithIndex.collect { case (c, b) if c > 0 => (b, c) }
    val poppedN = perBucketCounts.map(_._2).sum

    // overlapped driver-thread writes (politeness state + seen archive):
    // started only now, AFTER the docs job materialized the pop cache (so
    // they never recompute the pop in parallel); joined before the commit's
    // manifest RENAME so a torn round still replays against round r-1's
    // state (a stray round-r state/archive dir is harmless — replay
    // overwrites it; the manifest round gates visibility).
    var stateWrite: Option[Thread] = None
    @volatile var stateWriteError: Throwable = null
    def joinStateWrite(): Unit = {
      stateWrite.foreach(_.join())
      if (stateWriteError != null) throw stateWriteError
    }
    if (gated && offeredN > 0) {
      val t = new Thread(() =>
        try stateMap match {
          case Some(m) =>
            // driver-resident path: admitted counts come from the pop
            // walker's accumulator side output (zero extra jobs — the
            // former cache-scan aggregate is the fallback for pop forms
            // that don't carry the accumulator), merged into the resident
            // map with the same refill algebra as the column form. The
            // table is written host-sorted DIRECTLY from the driver
            // (canonical bytes; a 1-task Spark job queued seconds behind
            // running stages for ~2 MB), and the merged map seeds round
            // r+1, whose state read + collect jobs disappear entirely.
            val counts: java.util.HashMap[String, java.lang.Long] = admitAcc match {
              case Some(a) => a.flattened
              case None =>
                val perHost = cached.groupBy(col("host"))
                  .agg(sum(when(col("admit"), 1L).otherwise(0L)).as("adm_n"))
                  .collect()
                val mm = new java.util.HashMap[String, java.lang.Long](perHost.length * 2)
                perHost.foreach(row => mm.put(row.getString(0),
                  java.lang.Long.valueOf(row.getLong(1))))
                mm
            }
            val merged = new java.util.HashMap[String, (Double, Long)](m)
            counts.forEach { (h, adm) =>
              val refilled = graft.streaming.Politeness.refillAmount(
                merged.get(h), r.toLong, cfg.politenessRate, cfg.politenessBurst)
              merged.put(h, (refilled - adm.longValue(), r.toLong))
            }
            val rows = {
              import scala.jdk.CollectionConverters._
              merged.entrySet().iterator().asScala
                .map(e => (e.getKey, e.getValue._1, e.getValue._2))
                .toArray.sortBy(_._1)
            }
            graft.streaming.Politeness.writeStateParquet(
              s"$workDir/politeness/round-$r", rows)
            politenessCache =
              if (merged.size > broadcastStateMax) None else Some((r, merged))
          case None =>
            // window-form regime (> broadcastStateMax hosts): keep the
            // distributed aggregate + joins; no resident map at that scale
            graft.streaming.Politeness.nextState(
              cached, prevState, r.toLong, cfg.politenessRate, cfg.politenessBurst)
              .write.mode(SaveMode.Overwrite)
              .parquet(s"$workDir/politeness/round-$r")
            politenessCache = None
        } catch { case e: Throwable => stateWriteError = e })
      t.setName(s"politeness-state-r$r")
      t.start()
      stateWrite = Some(t)
    }

    // offered = pool rows the pop stage produced BEFORE the politeness
    // throttle — it distinguishes "frontier exhausted" (stop) from
    // "everything throttled this round" (advance and let tokens refill).
    // The docs job necessarily ran before `offered` was known (the counts
    // ride it), so an exhausted-pool round has left an EMPTY, uncommitted
    // docs/round=r dir. Delete it rather than leave it "invisible": how
    // many post-exhaustion rounds fire depends on the caller's tick
    // schedule (StreamingCrawler's processAllAvailable), and the
    // torn-round byte-identity invariant compares on-disk trees — a
    // schedule-dependent stray would flake it (StreamingSpec caught this).
    if (offeredN == 0) {
      cached.unpersist()
      deleteDir(Paths.get(s"$docsDir/round=$r"))
      return RoundStats(r, 0, 0, 0, 0, math.max(frontierRowsHint, 0L), 0)
    }
    if (poppedN == 0) {
      // throttled to zero: commit an empty delta (every bucket clean) so
      // the snapshot round advances and per-host tokens accrue
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Frontier.schema)
      val rows = (if (deltaModeActive)
        frontierTable.appendDelta(empty, r, 0L, beforeRename = () => joinStateWrite())
      else frontierTable.commit(empty, r, Some(Set.empty),
        beforeRename = () => joinStateWrite())) + seenRows
      writeLineage(r, Seq.empty, 0, 0, 0, 0, rows)
      cached.unpersist()
      return RoundStats(r, 0, 0, 0, 0, rows, offeredN)
    }

    // --- seen-archive append: the popped rows leave the pool this round.
    //     Written straight from the popped CACHE (no shuffle, immutable
    //     round dir — the docs pattern), on a driver thread overlapped
    //     with the expansion + merge + commit-write jobs; joined before
    //     the manifest rename so a torn round replays it idempotently
    //     (the overwrite of round=r).
    @volatile var seenWriteError: Throwable = null
    // partitionBy(host_bucket): each archive round is laid out per bucket,
    // so the SeenIndex (partition-local exact membership) can read ONLY
    // its own bucket's slice, column-pruned to `url`. SLIM data files:
    // host/last_visit are derivable (see seenWithRound) and never written.
    val seenWrite = new Thread(() =>
      try popped.select("url", "host_bucket", "depth", "discovered_at")
        .write.mode(SaveMode.Overwrite).options(writerOptions)
        .partitionBy("host_bucket")
        .parquet(s"$seenDir/round=$r")
      catch { case e: Throwable => seenWriteError = e })
    seenWrite.setName(s"seen-archive-r$r")
    seenWrite.start()
    // the overlapped politeness-state and seen-archive writes must land
    // BEFORE the atomic manifest rename (torn-round replay consistency) —
    // the hook joins them as late as possible, after the commit's own
    // write + footer jobs, maximizing the overlap window
    val joinOverlapped = () => {
      joinStateWrite()
      seenWrite.join()
      if (seenWriteError != null) throw seenWriteError
    }

    val written = spark.read.schema(out.drop("round").schema)
      .parquet(s"$docsDir/round=$r")

    // --- frontier expansion (urlStore.Add of Page.DocumentURLs,
    //     worker.go:1247) + visit marks, one atomic bucket-selective
    //     commit. Candidates stay RAW (dedup=false): mergeRound's single
    //     aggregation dedups them with identical min-struct semantics,
    //     saving one full candidate exchange per round.
    val rawNew = written
      .select(col("depth"), posexplode(col("links")).as(Seq("pos", "url")))
      .select(col("url"), (col("depth") + 1).as("depth"),
        (lit(r.toLong * 1000000L) + col("pos")).as("discovered_at"))
    // partition-local candidate thinning: links repeat heavily WITHIN a
    // fetch partition (same-host links target the host's own page space;
    // a hot host referenced from everywhere funnels ~millions of duplicate
    // rows per round into ONE merge partition — measured skew). A
    // per-partition min-priority hashmap collapses them BEFORE the merge
    // exchange — no shuffle of its own, and exact semantics: min(packed
    // prio) is associative, mergeRound's global aggregation re-mins across
    // partitions. This is the map-side partial aggregate Catalyst cannot
    // plan here (the merge's explicit bucket repartition precedes its
    // groupBy, so its partial agg runs post-shuffle). Memory is bounded by
    // the fetch task's own output (budget × links-per-page entries).
    val thinned = {
      import org.apache.spark.sql.Encoders
      implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaLong)
      // pre-sized: a task's map can reach millions of entries (docs-read
      // splits are few and links multiply pops), and growing a HashMap
      // from 16 pays ~18 full rehash passes PLUS permanent bin
      // treeification from the transient ≥0.75 load before each resize
      // (JFR r4: TreeNode.getTreeNode + resize were most of this lambda).
      // poppedN/2 ≈ per-task distinct links within a factor of a few;
      // capped at 2^22 slots (32 MB of refs) per task.
      val thinCap = math.min(1L << 22, math.max(1L << 10, poppedN / 2)).toInt
      // peek pre-filter: in a saturating crawl most links re-discover
      // already-seen pages, and each survivor costs exchange bytes + agg +
      // probe work downstream. The emission filter drops urls the
      // ALREADY-RESIDENT SeenIndex/PoolIndex sets know are seen — exact
      // (hits are real archive/pool members; misses just pass through to
      // the authoritative partition-local probes), peek-only (never loads
      // a bucket — on a cluster an executor simply knows whatever its
      // tasks loaded), and race-free (the thinning job is ordered after
      // every load-triggering job of the round).
      val seenRootB = s"$workDir/seen"
      val poolRootB = frontierTable.root
      val nbB = cfg.numBuckets
      rawNew.as[(String, Int, Long)].mapPartitions { it =>
        val best = new java.util.HashMap[String, java.lang.Long](thinCap)
        it.foreach { case (u, d, t) =>
          val k = (d.toLong << 47) + t
          val prev = best.get(u)
          if (prev == null || k < prev) best.put(u, k)
        }
        import scala.jdk.CollectionConverters._
        best.entrySet().iterator().asScala
          .filter(e => !Crawler.peekEverSeen(e.getKey, seenRootB, poolRootB, nbB))
          .map { e =>
            val k = e.getValue.longValue()
            (e.getKey, (k >> 47).toInt, k & ((1L << 47) - 1))
          }
      }.toDF("url", "depth", "discovered_at")
    }
    // ---- DELTA ROUND (LSM pool): append only the round's NEW urls as
    //      per-bucket sorted delta files; the base files are untouched and
    //      popped rows leave the pool logically (seen-archive filter at
    //      read). Commit I/O is O(delta + popped), never O(pool) — the
    //      former pool rewrite was the round's largest and worst-scaling
    //      stage (BENCH.md round-4 probe: ~half the round wall). Every
    //      poolDeltaRounds-th round runs the classic full merge below as
    //      the compaction. First-seen dedup against pool ∪ archive is two
    //      exact partition-local probes on the candidates' token-
    //      partitioned aggregation output (PoolIndex + SeenIndex).
    val snapCompact = frontierTable.currentSnapshot().map(_.compactRound).getOrElse(r)
    val deltaRound = deltaModeActive && (r - snapCompact) < cfg.poolDeltaRounds
    if (deltaRound) {
      val cands0 = Frontier.normalizeCandidates(thinned, cfg.numBuckets,
        cfg.respectRobots, dedup = false)
      val emptyF = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Frontier.schema)
      // in-round dedup with the merge's exact min-pack rule (ONE exchange
      // onto the balanced bucket token — also the layout the delta write
      // needs), then drop everything ever seen: pool members (base+deltas,
      // PoolIndex) and archived urls (SeenIndex) — together exactly the
      // classic merge's first-seen semantics (existing row always wins)
      val fresh = Frontier.mergeRound(emptyF, cands0, emptyF, r, cfg.numBuckets)
        .filter(!graft.functions.GraftExpressions.pool_index_contains(
          col("url"), frontierTable.root, r - 1))
        .filter(!graft.functions.GraftExpressions.seen_index_contains(
          col("url"), seenDir, r - 1))
      val poolRows = timed("commit")(
        frontierTable.appendDelta(fresh, r, -poppedN, beforeRename = joinOverlapped))
      seenRows += poppedN
      val frontierRows = poolRows + seenRows
      val newN = math.max(0L, frontierRows - math.max(frontierRowsHint, 0L))
      writeLineage(r, perBucketCounts, poppedN, fetchedOk, errs, newN, frontierRows)
      cached.unpersist()
      return RoundStats(r, poppedN, fetchedOk, errs, newN, frontierRows, offeredN)
    }

    val cands0 = Frontier.normalizeCandidates(thinned, cfg.numBuckets,
      cfg.respectRobots, dedup = cfg.useSeenFilter)
    // dirty buckets = buckets with pops or new candidates; ONLY their
    // frontier rows enter the merge shuffle and ONLY their files are
    // rewritten — per-round frontier I/O is O(touched), not O(pool).
    // DENSE shortcut: when the popped buckets already cover every manifest
    // bucket, everything is dirty — skip the candidate-bucket scan (it was
    // a near-serial extra pass; new buckets a candidate opens are adopted
    // by the commit regardless, they have no old rows to lose).
    // Delta-mode COMPACTION rounds always rewrite the whole table (the
    // live deltas must be absorbed into new base files): dirty = None.
    val allBuckets = frontierTable.currentSnapshot().map(_.buckets.keySet).getOrElse(Set.empty)
    val poppedBuckets = perBucketCounts.map(_._1).toSet
    val dense = deltaModeActive ||
      (allBuckets.nonEmpty && allBuckets.subsetOf(poppedBuckets))
    // persist only when consumed more than once (sparse path's distinct
    // job, or the seen-filter's split + update passes)
    val multiPass = !dense || cfg.useSeenFilter
    val cands = if (multiPass) cands0.persist() else cands0
    val dirty =
      if (dense) poppedBuckets
      else timed("cand-buckets")(
        cands.select("host_bucket").distinct().collect().map(_.getInt(0)).toSet) ++
        poppedBuckets
    // the merge's identity resolution (first-seen wins) must kill a
    // candidate re-discovering ANY ever-seen url. Live pool rows take part
    // in the aggregation; ARCHIVED urls do NOT ride the shuffle — that was
    // O(ever-seen) rows per round, unbounded with crawl age (round-3
    // decomposition). Instead, re-discoveries of archived urls are dropped
    // AFTER the aggregation by `seen_index_contains`: an exact,
    // partition-local probe of this bucket's archive slice (the merge
    // output is token-partitioned 1:1 bucket→partition, so the task's
    // partitionIndex IS the bucket — see graft.frontier.SeenIndex).
    // Per-round merge volume is O(pool + delta), never O(ever-seen).
    val frontierDirty =
      if (dense) pool
      else pool.filter(col("host_bucket").isin(dirty.toSeq.map(Int.box): _*))
    val dropArchived = (df: DataFrame) => df.filter(
      !graft.functions.GraftExpressions.seen_index_contains(col("url"), seenDir, r - 1))
    // optional per-partition cuckoo refinement (north rule): provably-new
    // candidates bypass the exact merge aggregation; correctness never
    // depends on it (advisory only — see SeenFilterStore)
    // mergeRound's output is already bucket-hash-partitioned — the commit
    // reuses that exchange (preClustered) unless the seen-filter union
    // broke it; the pool filter below preserves it. dropArchived applies
    // BEFORE that union (the union would break the partition→bucket
    // binding the index depends on; provably-new rows can't be archived).
    val merged =
      if (cfg.useSeenFilter) {
        val (provablyNew, maybeSeen) = seenFilters.split(spark, r - 1, cands)
        dropArchived(Frontier.mergeRound(frontierDirty, maybeSeen, popped, r, cfg.numBuckets))
          .unionByName(provablyNew)
      } else dropArchived(Frontier.mergeRound(frontierDirty, cands, popped, r, cfg.numBuckets))
    val poolNext = merged.filter(col("last_visit") === 0L)
    // delta-mode compaction is always a FULL commit (dirty = None): the
    // live delta files must be absorbed into the new base files
    val poolRows = timed("commit")(frontierTable.commit(poolNext, r,
      if (deltaModeActive) None else Some(dirty),
      preClustered = !cfg.useSeenFilter, beforeRename = joinOverlapped))
    seenRows += poppedN
    val frontierRows = poolRows + seenRows
    if (cfg.useSeenFilter)
      seenFilters.updateAndSave(spark, r, r - 1, cands, frontier())
    if (multiPass) cands.unpersist()
    val newN = math.max(0L, frontierRows - math.max(frontierRowsHint, 0L))

    writeLineage(r, perBucketCounts, poppedN, fetchedOk, errs, newN, frontierRows)
    cached.unpersist()
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

  /** The full ever-seen view: live pool ∪ archive. With `unique=false`
    * (re-visiting crawls) an archived url re-pops and appends a NEW
    * archive row per visit — collapse to one row per url with the latest
    * visit mark, exactly the single-table update-in-place semantics. */
  def frontier(): DataFrame = {
    val v = poolView.unionByName(seen())
    if (cfg.unique) v
    else v.groupBy("url", "host", "host_bucket", "depth", "discovered_at")
      .agg(max("last_visit").as("last_visit"))
      .select(Frontier.schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}

object Crawler {
  /** Advisory-exact ever-seen peek for the link-thinning emission filter:
    * derive the url's bucket exactly like [[Frontier.hostBucket]]
    * (xxhash64 seed 42 of the host, pmod numBuckets) and probe the
    * resident [[graft.frontier.SeenIndex]]/[[graft.frontier.PoolIndex]]
    * sets WITHOUT loading. False = unknown — the candidate proceeds to
    * the authoritative partition-local probes. */
  def peekEverSeen(url: String, seenRoot: String, poolRoot: String,
      numBuckets: Int): Boolean = {
    val host = graft.functions.UrlFns.hostOf(url)
    if (host == null) return false
    val hu = org.apache.spark.unsafe.types.UTF8String.fromString(host)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(hu.getBaseObject, hu.getBaseOffset, hu.numBytes, 42L)
    val b = (((h % numBuckets) + numBuckets) % numBuckets).toInt
    val uu = org.apache.spark.unsafe.types.UTF8String.fromString(url)
    graft.frontier.SeenIndex.peek(seenRoot, b, uu) ||
      graft.frontier.PoolIndex.peek(poolRoot, b, uu)
  }
}

case class CrawlConfig(
    numBuckets: Int = 32,
    perHostBudget: Int = 4,
    perBucketBudget: Int = 1000,
    sampler: String = "fifo",
    seed: Long = 42L,
    unique: Boolean = true,
    /** Hot-host skew control for the fetch stage: 0 (default) fetches in
      * place on the bucket-clustered pop output (per-host budget already
      * bounds skew); >0 shuffles on `host#salt`, splitting any host across
      * that many partitions — for unbounded per-host round shares. */
    saltFactor: Int = 0,
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
    parquetBlockBytes: Long = 0L,
    /** Compression codec for the FRONTIER bucket files only ("" = session
      * default). The pool rewrite is encode-CPU- and fresh-page-bound in
      * different host regimes — the knob lets benches A/B zstd (fewest
      * bytes) against snappy/lz4 (least encode CPU). */
    frontierCodec: String = "",
    /** Delta-pool (LSM) mode: K > 1 makes K−1 of every K rounds append
      * only the round's NEW urls as per-bucket sorted delta files (commit
      * I/O O(delta + popped), the Iceberg MERGE-INTO/positional-delete
      * shape), with the K-th round running the classic full merge as the
      * compaction. Popped rows leave the pool logically via the exact
      * seen-archive filter at read. 0/1 = classic per-round rewrite.
      * Requires unique=true, sampler=fifo, useSeenFilter=false. */
    poolDeltaRounds: Int = 1)

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
