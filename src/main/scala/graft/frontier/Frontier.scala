package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The distributed URL frontier — kraaler's `urlStore` (seen-set + pool +
 * samplers, /root/reference/store/url.go) re-designed as pure DataFrame
 * transformations over a host-bucketed partitioned priority queue.
 *
 * Design for 10^10 URLs (north rule):
 *  - one row per ever-seen URL (like `url_visits`, store/init.go:220-225);
 *    `last_visit` = 0 until visited — visited rows stay, because the
 *    seen-set check is against ALL ever-seen URLs (store/url.go:168-170);
 *  - rows are partitioned by `host_bucket = pmod(xxhash64(host), P)` so
 *    pop/visit/dedup all shuffle on the same key → co-partitioned joins;
 *  - membership: broadcast Bloom filter as an ADVISORY pre-filter only —
 *    bloom-negative candidates are provably new and skip the join; only
 *    bloom-positives pay the exact left-anti join (false positives never
 *    drop a URL — SURVEY.md §7.3 hard part 2);
 *  - politeness: per-host row_number cap per round (the 1-in-flight ready
 *    token of worker.go:1238-1253, generalized to a budget);
 *  - priority: (depth, discovered_at, url) — crawl-depth then discovery
 *    time, ties broken deterministically.
 */
object Frontier {

  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("host_bucket", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("discovered_at", LongType, nullable = false),
    StructField("last_visit", LongType, nullable = false)))

  def hostBucket(host: Column, numBuckets: Int): Column =
    pmod(xxhash64(host), lit(numBuckets)).cast(IntegerType)

  /**
   * Normalize raw candidate URLs (columns: url, depth, discovered_at) into
   * frontier shape. Drops `data:` URLs (worker.go:1032-1034) and URLs with
   * no parseable host; lowercases/trims like ReadDomainsFromFile
   * (kraaler.go:38-48). In-batch dedup keeps the first-seen (min depth,
   * then min discovered_at) occurrence.
   */
  def normalizeCandidates(raw: DataFrame, numBuckets: Int,
      respectRobots: Boolean = false): DataFrame = {
    graft.functions.GraftExpressions.register(raw.sparkSession)
    val preFiltered = raw
      .withColumn("url", trim(col("url")))
      .filter(!col("url").startsWith("data:"))
    val withHost = (if (respectRobots)
      preFiltered.filter(coalesce(
        graft.functions.GraftExpressions.robots_allowed(col("url")), lit(false)))
    else preFiltered)
      .withColumn("host", graft.functions.GraftExpressions.url_host(col("url")))
      .filter(col("host").isNotNull)
      .withColumn("host_bucket", hostBucket(col("host"), numBuckets))
    withHost
      .groupBy(col("url"))
      .agg(min(struct(col("depth"), col("discovered_at"), col("host"),
        col("host_bucket"))).as("s"))
      .select(col("url"), col("s.host").as("host"),
        col("s.host_bucket").as("host_bucket"), col("s.depth").as("depth"),
        col("s.discovered_at").as("discovered_at"),
        lit(0L).as("last_visit"))
  }

  /**
   * URL-seen dedup (urlStore.Add, store/url.go:155-220): return only the
   * candidates NOT already in the frontier. Bloom pre-filter + exact
   * anti-join on bloom-positives; never drops on a Bloom hit alone.
   */
  /** @param expectedRows frontier cardinality hint (e.g. from the table
    *   manifest) — avoids a count scan; pass -1 to count here.
    * @param bloomMinRows below this the Bloom pre-filter is skipped (one
    *   anti-join beats building+broadcasting a filter for small tables). */
  def newOnly(frontier: DataFrame, candidates: DataFrame,
      expectedRows: Long = -1L, bloomMinRows: Long = 4000000L): DataFrame = {
    val n = if (expectedRows >= 0) expectedRows else frontier.count()
    if (n == 0) return candidates
    if (n < bloomMinRows)
      return candidates.join(frontier.select("url"), Seq("url"), "left_anti")
    val bloom = frontier.stat.bloomFilter("url", math.max(n, 64L), 0.03)
    val bBloom = frontier.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((u: String) => bBloom.value.mightContain(u))
    val maybeSeen = candidates.filter(mightContain(col("url")))
    val definitelyNew = candidates.filter(!mightContain(col("url")))
    val survivors = maybeSeen.join(frontier.select("url"), Seq("url"), "left_anti")
    definitelyNew.unionByName(survivors)
  }

  /** Stream anti-join of domains vs seen URLs in both schemes
    * (urlStore.FilterKnown, store/url.go:251-276). */
  def filterKnown(domains: DataFrame, frontier: DataFrame): DataFrame = {
    val withUrls = domains
      .withColumn("http_url", concat(lit("http://"), col("domain")))
      .withColumn("https_url", concat(lit("https://"), col("domain")))
    withUrls
      .join(frontier.select(col("url").as("http_url")), Seq("http_url"), "left_anti")
      .join(frontier.select(col("url").as("https_url")), Seq("https_url"), "left_anti")
      .select(col("domain"))
  }

  /** Sampler priority key (lower = popped first).
    *  - fifo    : discovery order per host — the deterministic ordering the
    *              correctness gate compares (SURVEY.md §7.3 hard part 3)
    *  - uniform : seeded hash order (UniformSampler, store/url.go:280-295,
    *              wall-clock rand replaced by xxhash64(url, seed))
    *  - pair    : host-fairness weighted order (PairSampler,
    *              store/url.go:297-333): weight = base/(visited+1), base =
    *              2000 iff host has exactly 1 visit; realized as an
    *              exponential race -ln(u)/w so a single sort implements
    *              weighted sampling without replacement.
    */
  def priorityKey(sampler: String, seed: Long, visitedByHost: Option[DataFrame],
      boost: Double = 2000.0): DataFrame => DataFrame = { unvisited =>
    sampler match {
      case "fifo" =>
        unvisited.withColumn("prio",
          struct(col("depth"), col("discovered_at"), col("url")))
      case "uniform" =>
        unvisited.withColumn("prio",
          struct(xxhash64(col("url"), lit(seed)), col("url")))
      case "pair" =>
        val vc = visitedByHost.getOrElse(
          unvisited.sparkSession.emptyDataFrame
            .select(lit("").as("host"), lit(0L).as("visits")).limit(0))
        val joined = unvisited.join(broadcast(vc), Seq("host"), "left")
          .withColumn("visits", coalesce(col("visits"), lit(0L)))
        val base = when(col("visits") === 1, lit(boost)).otherwise(lit(1.0))
        val w = base / (col("visits") + lit(1.0))
        // u in (0,1), deterministic per (url, seed)
        val u = (pmod(xxhash64(col("url"), lit(seed)), lit(1000000000L))
          .cast(DoubleType) + lit(1.0)) / lit(1000000001.0)
        joined.withColumn("prio", struct((-log(u) / w).as("k"), col("url")))
          .drop("visits")
      case other => throw new IllegalArgumentException(s"unknown sampler: $other")
    }
  }

  /**
   * Pop one fetch round (urlStore.Sample generalized to a batch,
   * store/url.go:125-145): per-host politeness cap, then per-bucket budget.
   * Both windows partition by keys the frontier is already bucketed on, so
   * the sort is per-partition — no global ordering, no driver collect.
   */
  def pop(frontier: DataFrame, sampler: String, seed: Long,
      perHostBudget: Int, perBucketBudget: Int, unique: Boolean = true,
      boost: Double = 2000.0): DataFrame = {
    val pool = if (unique) frontier.filter(col("last_visit") === 0L) else frontier
    val visitedByHost =
      if (sampler == "pair")
        Some(frontier.filter(col("last_visit") > 0L)
          .groupBy("host").agg(count(lit(1)).as("visits")))
      else None
    // Single exchange: repartition on host_bucket, then BOTH windows'
    // required clustering is already satisfied — (host_bucket, host) and
    // (host_bucket) are subsets-compatible with hash(host_bucket) — so
    // Catalyst plans sort-only windows with no further shuffle. (host
    // determines host_bucket, so ranking per (host_bucket, host) IS the
    // per-host politeness rank.)
    val keyed = priorityKey(sampler, seed, visitedByHost, boost)(pool)
      .repartition(col("host_bucket"))
    val byHost = Window.partitionBy(col("host_bucket"), col("host")).orderBy(col("prio"))
    val byBucket = Window.partitionBy(col("host_bucket")).orderBy(col("prio"))
    keyed
      .withColumn("rn_host", row_number().over(byHost))
      .filter(col("rn_host") <= perHostBudget)
      .withColumn("rn_bucket", row_number().over(byBucket))
      .filter(col("rn_bucket") <= perBucketBudget)
      .select("url", "host", "host_bucket", "depth", "discovered_at")
  }

  /**
   * One-pass round merge — the MERGE INTO formulation of
   * (Add new candidates ⊕ Visit popped) that a real Iceberg table would
   * run: frontier FULL OUTER JOIN delta on url, where delta = candidate
   * rows (insert-if-absent; existing row wins = first-seen dedup,
   * store/url.go:168-170) ∪ visit marks (update last_visit,
   * store/url.go:222-249). Replaces the anti-join + mark-join + union
   * chain with a single frontier exchange per round.
   */
  def mergeRound(frontier: DataFrame, cands: DataFrame, popped: DataFrame,
      round: Long): DataFrame = {
    val delta = cands
      .withColumn("new_visit", lit(null).cast(LongType))
      .unionByName(popped.select(col("url"), lit(null).cast(StringType).as("host"),
        lit(null).cast(IntegerType).as("host_bucket"),
        lit(null).cast(IntegerType).as("depth"),
        lit(null).cast(LongType).as("discovered_at"),
        lit(null).cast(LongType).as("last_visit"),
        lit(round).as("new_visit")))
      .groupBy("url")
      .agg(first(col("host"), ignoreNulls = true).as("host"),
        first(col("host_bucket"), ignoreNulls = true).as("host_bucket"),
        first(col("depth"), ignoreNulls = true).as("depth"),
        first(col("discovered_at"), ignoreNulls = true).as("discovered_at"),
        max(col("new_visit")).as("new_visit"))
    frontier.as("f")
      .join(delta.as("d"), Seq("url"), "full_outer")
      .select(col("url"),
        coalesce(col("f.host"), col("d.host")).as("host"),
        coalesce(col("f.host_bucket"), col("d.host_bucket")).as("host_bucket"),
        coalesce(col("f.depth"), col("d.depth")).as("depth"),
        coalesce(col("f.discovered_at"), col("d.discovered_at")).as("discovered_at"),
        coalesce(col("d.new_visit"), col("f.last_visit"), lit(0L)).as("last_visit"))
      .filter(col("host").isNotNull) // mark-only rows can't occur; belt+braces
  }

  /** Mark popped URLs visited at `round` (urlStore.Visit,
    * store/url.go:222-249). Rows are retained — the seen-set must keep
    * them (resume + dedup correctness). Implemented as a co-partitioned
    * left join on (host_bucket, url). */
  def markVisited(frontier: DataFrame, popped: DataFrame, round: Long): DataFrame = {
    val marks = popped.select(col("url"), lit(round).as("new_visit"))
    frontier
      .join(marks, Seq("url"), "left")
      .withColumn("last_visit",
        when(col("new_visit").isNotNull, col("new_visit")).otherwise(col("last_visit")))
      .drop("new_visit")
  }
}
