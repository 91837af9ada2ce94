package graft.tools

import graft.Bench

/** Dev probe: one crawlBench at N and 4N with GRAFT_ROUND_TIMING stage
  * breakdowns, to localize the serial floor. */
object CrawlBenchProbe {
  def main(args: Array[String]): Unit = {
    val seeds = sys.env.getOrElse("GRAFT_BENCH_SEEDS", "2000000").toLong
    val rounds = sys.env.getOrElse("GRAFT_BENCH_ROUNDS", "2").toInt
    val levels = sys.env.getOrElse("GRAFT_PROBE_LEVELS", "8,32")
      .split(",").toSeq.map(_.trim.toInt)
    val politeness = sys.env.getOrElse("GRAFT_BENCH_POLITENESS", "0").toDouble
    // JIT warm-up session (same as Bench.main)
    Bench.crawlBench(32, 100000, 1, politeness)
    for (cores <- levels) {
      val r = Bench.crawlBench(cores, seeds, rounds, politeness)
      println(f"[probe] cores=$cores urls=${r.popped} sec=${r.sec}%.2f " +
        f"rate=${r.popped / r.sec}%.0f rounds=${r.rounds.map { case (p, s, c) =>
          f"($p,$s%.1fs,${c}%.1fcpu)" }.mkString(",")}")
    }
  }
}
