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
  def normalizeCandidates(raw: DataFrame, numBuckets: Int): DataFrame = {
    graft.functions.GraftExpressions.register(raw.sparkSession)
    val withHost = raw
      .withColumn("url", trim(col("url")))
      .filter(!col("url").startsWith("data:"))
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
  def newOnly(frontier: DataFrame, candidates: DataFrame): DataFrame = {
    val n = frontier.count()
    if (n == 0) return candidates
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
    val keyed = priorityKey(sampler, seed, visitedByHost, boost)(pool)
    val byHost = Window.partitionBy(col("host")).orderBy(col("prio"))
    val byBucket = Window.partitionBy(col("host_bucket")).orderBy(col("prio"))
    keyed
      .withColumn("rn_host", row_number().over(byHost))
      .filter(col("rn_host") <= perHostBudget)
      .withColumn("rn_bucket", row_number().over(byBucket))
      .filter(col("rn_bucket") <= perBucketBudget)
      .select("url", "host", "host_bucket", "depth", "discovered_at")
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
