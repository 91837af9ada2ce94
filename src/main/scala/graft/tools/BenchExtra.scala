package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Round-6 optimization probe (guide §1.4/§1.5): time a SUBSET of the
  * declared queries under the EXACT session configuration `graft.Bench`
  * uses (same master, shuffle partitions, file-split heuristics, local
  * dir, codec), with the noop sink and clearCache-per-rep methodology the
  * frozen bench applies — so numbers read here are directly comparable to
  * the driver's per-query timings without paying the crawl campaign.
  *
  * Usage: runMain graft.tools.BenchExtra <sfDir> <q1,q2,...|all> [reps=2]
  *  - GRAFT_EXPLAIN_DIR=/path  → write <name>.txt explain("formatted") per query
  *  - GRAFT_STAGE_TIMING=1     → per-stage wall/cpu/shuffle lines on stderr
  * Prints one line per query: [bench-extra] <name> min=<s> runs=[..]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // session mirrors Bench.session(cores) for the query suite (no zstd
    // shuffle — the suite session keeps lz4), field for field
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", (4 * cpus).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (16 * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.hadoop.parquet.compression.codec.zstd.level", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_STAGE_TIMING"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          if (wall >= 0.05) {
            val m = i.taskMetrics
            System.err.println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-4d " +
              f"wall=$wall%6.2fs run=${m.executorRunTime / 1e3}%7.2fs " +
              f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
              f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.1fMB " +
              i.name.takeWhile(_ != '\n').take(80))
          }
        }
      })
    val explainDir = sys.env.get("GRAFT_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      explainDir.foreach { d =>
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name.txt"), plan)
        spark.catalog.clearCache()
      }
      spark.sparkContext.setJobDescription(name)
      val runs = (1 to reps).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[rep-done] $name $i $s%.2f")
        s
      }
      spark.sparkContext.setJobDescription(null)
      println(f"[bench-extra] $name min=${runs.min}%.2f runs=[" +
        runs.map(r => f"$r%.2f").mkString(",") + "]")
    }
    spark.stop()
  }
}
