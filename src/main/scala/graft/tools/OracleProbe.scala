package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: dump `cosineNearDupPairs` (literal md5 planes) at an
  * arbitrary threshold so the q27 oracle SQL can be cross-checked against
  * DuckDB in a regime where the pair set is NON-empty (at the shipped 0.8
  * threshold small SFs produce zero pairs and the hash-match is trivial).
  * Usage: runMain graft.tools.OracleProbe <sfDir> <outDir> <threshold>
  */
object OracleProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, thr) = args.take(3)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-oracle-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Similarity.cosineNearDupPairs(emb, threshold = thr.toDouble,
      tables = 12, planesPerTable = 10, md5Planes = true)
      .orderBy("a_id", "b_id")
      .write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
