package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall time of the q30 IVF pipeline. */
object IvfStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("ivf-stage-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivf-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[ivf-probe] rows=${emb.count()}")
    (1 to 2).foreach { rep =>
      val init = t(s"rep$rep kmeansInit(iters=0)") {
        Similarity.kmeansCentroids(emb, cells = 16, iters = 0)
      }
      t(s"rep$rep lloyd-1-iter") {
        Similarity.kmeansCentroids(emb, cells = 16, iters = 1)
      }
      val centroids = t(s"rep$rep kmeansCentroids(4)") {
        Similarity.kmeansCentroids(emb, cells = 16, iters = 4)
      }
      val assigned = t(s"rep$rep ivfAssign.count") {
        val a = Similarity.ivfAssign(emb, centroids); a.count(); a
      }
      t(s"rep$rep probes-only") {
        Similarity.ivfTopK(assigned.limit(0), centroids,
          emb.filter(col("vec_id") < 20), k = 5, nprobe = 4).count()
      }
      t(s"rep$rep ivfTopK.count") {
        Similarity.ivfTopK(assigned, centroids, emb.filter(col("vec_id") < 20),
          k = 5, nprobe = 4).count()
      }
      val _ = init
    }
    spark.stop()
  }
}
