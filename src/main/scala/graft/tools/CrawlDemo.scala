package graft.tools

import graft.fetch.FetchSim
import graft.pipeline.{CrawlConfig, Crawler}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end crawl drive: seeds a synthetic web, runs fetch rounds to
 * closure (or maxRounds), prints per-round lineage and a sample of the
 * resulting interleaved-span docs table.
 *
 * Usage: runMain graft.tools.CrawlDemo [workDir] [seeds] [rounds]
 */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val nSeeds = args.lift(1).map(_.toInt).getOrElse(20)
    val maxRounds = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sim = new FetchSim(numHosts = 50, pagesPerHost = 30)
    val crawler = new Crawler(spark, workDir, sim,
      CrawlConfig(numBuckets = 16, perHostBudget = 3, perBucketBudget = 200))
    crawler.addSeeds(sim.seedUrls(nSeeds))
    println(s"[demo] workDir=$workDir seeds=$nSeeds")
    var i = 0
    var done = false
    while (i < maxRounds && !done) {
      val s = crawler.round()
      println(s"[demo] round=${s.round} popped=${s.popped} ok=${s.fetchedOk} " +
        s"errors=${s.errors} new=${s.newUrls} frontier=${s.frontierRows}")
      done = s.popped == 0
      i += 1
    }
    val docs = crawler.docs()
    println(s"[demo] docs rows=${docs.count()}")
    docs.select(col("doc_id"), col("round"),
        expr("size(spans)").as("n_spans"),
        expr("transform(slice(spans, 1, 4), s -> s.kind)").as("first_kinds"))
      .show(10, truncate = false)
    println("[demo] span kind histogram:")
    docs.select(explode(col("spans")).as("s"))
      .groupBy(col("s.kind")).count().orderBy(desc("count")).show()
    spark.stop()
  }
}
