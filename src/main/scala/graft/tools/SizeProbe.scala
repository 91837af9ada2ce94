package graft.tools
import graft.fetch.FetchSim
import graft.pipeline.{CrawlConfig, Crawler}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: bytes written per round under a given parquet codec. */
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val codec = sys.env.getOrElse("GRAFT_CODEC", "snappy")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.hadoop.parquet.compression.codec.zstd.level", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("graft-size").toString
    val sim = new FetchSim(numHosts = 2000, pagesPerHost = 500, linksPerPage = 6)
    val cfg = CrawlConfig(numBuckets = 32, perHostBudget = 100, perBucketBudget = 40000,
      sampler = "fifo", saltFactor = 8, storeFiles = false,
      parquetBlockBytes = 16L * 1024 * 1024)
    val crawler = new Crawler(spark, work, sim, cfg)
    val seeds = spark.range(900000).select(
      concat(lit("http://h"), pmod(xxhash64(col("id"), lit(7)), lit(sim.numHosts)),
        lit(".test/p/"), pmod(xxhash64(col("id"), lit(13)), lit(sim.pagesPerHost))).as("url"),
      lit(0).as("depth"), col("id").as("discovered_at"))
    crawler.addSeedCandidates(seeds)
    crawler.round(); crawler.round()
    def du(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists) 0L
      else if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => du(x.getPath)).sum).getOrElse(0L)
    }
    println(f"[size] codec=$codec docs=${du(s"$work/docs")/1e6}%.1fMB frontier=${du(s"$work/frontier")/1e6}%.1fMB")
    spark.stop()
  }
}
