package graft.tools
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: stage timings for the near-dup pipelines at sf0.1. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    def t[T](l: String)(f: => T): T = { val t0 = System.nanoTime(); val v = f
      println(f"[probe] $l%-28s ${(System.nanoTime()-t0)/1e9}%.2fs"); v }
    t("q24 prefix-filter full")(println("pairs=" + Dedup.ngramJaccardPairs(docs, 3, 0.5).count()))
    t("q24 again (warm)")(println("pairs=" + Dedup.ngramJaccardPairs(docs, 3, 0.5).count()))
    t("q25 minhash full")(println("pairs=" + Dedup.minhashLshPairs(docs, 3, 0.8).count()))
    t("q28 simhash full")(println("pairs=" + Dedup.simhashPairs(docs, 3).count()))
    // q33 split: pair generation vs the CC driver loop (pairs pinned so the
    // CC timing doesn't re-run the PPJoin)
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).persist()
    t("q33 pairs materialize")(println("pairs=" + pairs.count()))
    t("q33 cc only")(println("nodes=" + Dedup.connectedComponents(pairs).count()))
    t("q33 cc only (warm)")(println("nodes=" + Dedup.connectedComponents(pairs).count()))
    spark.stop()
  }
}
