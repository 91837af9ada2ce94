package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: does an eager localCheckpoint fire `observe` metrics?
  * (If yes, the CC loop's convergence checksum can ride the checkpoint
  * job instead of paying a second action per iteration.) */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").filter(col("x") % 2 === 0)
    val obs = Observation("cs")
    val t0 = System.nanoTime()
    val cp = df.observe(obs, count(lit(1)).as("cnt"),
      call_function("bit_xor", xxhash64(col("x"))).as("xr")).localCheckpoint(true)
    // obs.get blocks until an action fires the listener — wrap in a timed
    // wait: a timeout means the checkpoint action did NOT fire the
    // observation and the fusion idea is dead
    def timedGet(o: Observation): String = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      try Await.result(Future(o.get), 5.seconds).toString
      catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT (not fired)" }
    }
    val m = timedGet(obs)
    println(s"[observe-probe] after localCheckpoint(eager): metrics=$m " +
      f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    // sanity: a plain noop-write action must fire it
    val obs2 = Observation("cs2")
    val df2 = (1 to 100).toDF("x")
      .observe(obs2, count(lit(1)).as("cnt"))
    df2.write.format("noop").mode("overwrite").save()
    println(s"[observe-probe] after noop write: metrics=${timedGet(obs2)}")
    println(s"[observe-probe] checkpointed rows=${cp.count()}")
    spark.stop()
  }
}
