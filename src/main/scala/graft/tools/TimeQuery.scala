package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: time ONE named SparkEntry query in isolation (the full
  * Bench main runs the whole suite — too slow a feedback loop when
  * iterating on a single operator). Prints per-rep wall seconds and,
  * with GRAFT_EXPLAIN=1, the formatted physical plan.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <name> [reps=2] [cpus=32]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-time-query")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time-query] $name rep$i: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
