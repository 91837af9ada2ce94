package graft.streaming

import graft.pipeline.{Crawler, RoundStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming front-end for the crawl pipeline: one micro-batch =
 * one fetch round (SURVEY.md §2.6). A rate source is the tick generator
 * (the analogue of kraaler's scheduler loop, /root/reference/worker.go:
 * 1258-1279 — unbounded, processing-time, no event-time semantics to
 * watermark); `foreachBatch` runs [[Crawler.round]], whose effects commit
 * through the [[graft.sources.IcebergishTable]] manifest.
 *
 * Exactly-once/resume story: the streaming checkpoint makes the TICKS
 * replayable, and the frontier manifest makes the ROUNDS idempotent — a
 * replayed tick sees `lastRound` already bumped and re-runs only a torn
 * round (overwriting its own partition). This matches the reference's
 * transaction-per-session recovery (store/store.go:69-105) without a
 * single-writer bottleneck.
 */
class StreamingCrawler(spark: SparkSession, crawler: Crawler, checkpointDir: String) {

  @volatile private var stats: List[RoundStats] = Nil
  def roundStats: Seq[RoundStats] = stats.reverse

  /** Run rounds as micro-batches until the frontier drains or `maxRounds`
    * fire; returns per-round stats. Blocking. */
  def run(maxRounds: Int, tickMs: Long = 10L): Seq[RoundStats] = {
    val ticks = spark.readStream
      .format("rate")
      .option("rowsPerSecond", math.max(1L, 1000L / math.max(tickMs, 1L)))
      .load()
    val query = ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(tickMs))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // rate rows are ignored — the batch is just the round tick
        val s = crawler.round()
        stats = s :: stats
        ()
      }
      .start()
    try {
      while (query.isActive && stats.length < maxRounds &&
        !stats.headOption.exists(_.popped == 0)) {
        query.processAllAvailable()
        Thread.sleep(5)
      }
    } finally {
      query.stop()
      query.awaitTermination()
    }
    roundStats.takeWhile(_.popped > 0)
  }
}
