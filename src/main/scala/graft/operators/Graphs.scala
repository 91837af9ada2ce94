package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for crawl-frontier prioritization — the missing
 * scoring signal between the frontier's FIFO/priority ordering
 * ([[graft.frontier.Frontier]]) and a production crawler's "fetch
 * important pages first" policy (the reference crawls in discovery
 * order; a web-scale frontier ranks by link analysis).
 *
 * PageRank (Page et al. 1999) in INTEGER MICRO-UNITS: ranks are longs
 * (1.0 == 1,000,000), per-edge contributions are integer division by
 * out-degree, and the damping step is `0.15 + 0.85·s` computed as
 * `150000 + (s·85) div 100` — no float accumulates in engine-dependent
 * order, so the result is bit-identical across Spark and DuckDB (the
 * q44/q47 micro-quantization discipline) and the oracle replays every
 * iteration as an unrolled CTE layer.
 *
 * Shape at 100 TB: the edge list is the big table; ranks are O(nodes).
 * Each iteration is ONE shuffle of slim (dst, contrib) rows for the
 * map-side-combined groupBy(dst), plus a join of edges to ranks on src —
 * edges are hash-partitioned on src ONCE up front, so every iteration's
 * join reuses that exchange (ranks, the small side, re-shuffles). Hot
 * pages (in-degree skew) are partial-aggregated before the exchange;
 * AQE's skew-join handles the residual. For a fixed small iteration
 * count the unrolled lineage is fine; an open-ended loop would
 * localCheckpoint per iteration (the q33 connected-components
 * discipline, Dedup.dedupGroups).
 */
object Graphs {

  /** 60-bit md5-derived value — the cross-engine hash discipline
    * ([[Dedup.md5Hash60]]; DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`). */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * Deterministic synthetic link graph over a document table: node set =
   * `doc_id`, and each node emits exactly `fanout` out-edges whose
   * targets are md5-drawn uniform over the node set (self-loops and
   * parallel edges kept — PageRank is defined over multigraphs). Both
   * engines rebuild the identical edge list from the same md5 stream, so
   * graph algorithms over it are end-to-end hash-verifiable.
   *
   * @param nNodes node count (doc_ids are 0..n-1 in the testdata); taken
   *   as a parameter so callers pay ONE `count()` (parquet-footer
   *   metadata, no scan) and reuse it.
   */
  def linkGraph(docs: DataFrame, nNodes: Long, fanout: Int = 4): DataFrame =
    docs.select(col("doc_id").as("src"),
        explode(sequence(lit(0), lit(fanout - 1))).as("j"))
      .select(col("src"),
        (md5Long(concat(lit("pr:"), col("src"), lit(":"), col("j"))) % nNodes)
          .as("dst"))

  /**
   * Fixed-iteration integer PageRank over [[linkGraph]].
   *
   * r₀(u) = 1e6 micro; per iteration each edge carries
   * `r(src) div fanout` (every node has exactly `fanout` out-edges by
   * construction — no dangling-mass term), and
   * `r'(v) = 150000 + (85 · Σ contrib(v)) div 100`. Nodes with no
   * in-links settle at the 150000 teleport floor.
   *
   * Output: (doc_id, pr_micro, indeg) — the rank after `iters`
   * iterations plus the in-degree (parallel edges counted), i.e. the
   * two frontier-priority signals a crawl scheduler would feed into
   * [[graft.frontier.Frontier]]'s packed priority.
   */
  def pageRank(docs: DataFrame, iters: Int = 3, fanout: Int = 4): DataFrame = {
    val n = docs.count()
    // One exchange up front; every iteration's src-join and the indeg
    // aggregate reuse the pre-partitioned edge list. Eager localCheckpoint
    // rather than cache(): same storage reuse, but the blocks are
    // ContextCleaner-reclaimed when the result's lineage is dropped —
    // cache() entries would pin CacheManager storage until an explicit
    // unpersist the lazy return value cannot sequence (the q33
    // dedupGroups discipline, Dedup.scala).
    val edges = linkGraph(docs, n, fanout).repartition(col("src"))
      .localCheckpoint(true)
    val nodes = docs.select(col("doc_id").as("id"))
    var ranks = nodes.select(col("id"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"pr div $fanout")).as("s"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(coalesce(s, 0L) * 85) div 100")).as("pr"))
    }
    val indeg = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("indeg"))
    ranks.join(indeg, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("pr").as("pr_micro"),
        coalesce(col("indeg"), lit(0L)).as("indeg"))
  }
}
