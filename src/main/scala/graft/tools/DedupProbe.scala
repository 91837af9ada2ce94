package graft.tools
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[T](l: String)(f: => T): T = { val t0 = System.nanoTime(); val v = f
      println(f"[probe] $l%-28s ${(System.nanoTime()-t0)/1e9}%.2fs"); v }
    // stage 1: shingles only
    val prep = docs.select(col("doc_id"), Dedup.shingleArr(col("text"), 3).as("sh"),
      (TextOps.tokenCount(col("text")) / 16).cast("int").as("band")).persist()
    t("prep (shingle+band)")(prep.count())
    val left = prep.select(col("doc_id").as("a_id"),
      explode(array(col("band")-1, col("band"), col("band")+1)).as("band"))
    val right = prep.select(col("doc_id").as("b_id"), col("band"))
    val candIds = left.join(right, Seq("band")).filter(col("a_id") < col("b_id"))
      .select("a_id","b_id").dropDuplicates("a_id","b_id").persist()
    t("candIds gen")(println("cands=" + candIds.count()))
    t("q24 full")(println("pairs=" + Dedup.ngramJaccardPairs(docs, 3, 0.5).count()))
    // minhash stages
    val prep2 = docs.select(col("doc_id"), Dedup.shingleArr(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 128)).persist()
    t("minhash sig")(prep2.count())
    t("q25 full")(println("pairs=" + Dedup.minhashLshPairs(docs, 3, 0.8).count()))
    spark.stop()
  }
}
