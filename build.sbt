ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kraalerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run mains (Bench/Verify) inherit stdout DIRECTLY instead of
// being piped through sbt's logger: the logger prefixes every line with
// "[info] ", which breaks any line-wise json.loads on Bench's one-line
// JSON contract (the driver's BENCH_r{3,4}.json captures parsed to null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// local[32] with cached fetch rounds needs real heap; the box has 128 GiB.
// Xms=Xmx: heap-growth pauses would otherwise pollute the scaling bench.
// 32g, NOT bigger: this Firecracker guest's memory is hypervisor-backed
// with free-page reporting — commit of a FRESH page faults through the
// host at only ~200 MB/s (measured: -XX:+AlwaysPreTouch of an 80g heap
// took 7 minutes). G1 rotates eden across all regions, so the whole heap
// gets first-touched within a few rounds: at 80g that was a rolling
// ~400 s kernel-time tax that hit exactly the allocation-heavy 32-thread
// stages (GC logs showed Sys≈5×User), inverting the N→4N scaling signal.
// 32g keeps the commit surface small while still fitting execution memory
// (0.6 × heap) beside a multi-GB eden under G1's incremental old-gen
// reclaim (ParallelGC at 48g could not — round-2 finding).
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")
// young gen at a QUARTER of the resolved heap (never a fixed size: a fixed
// -Xmn above a smaller SPARK_DRIVER_MEM override would refuse to start the
// JVM). A large eden absorbs the fetch stage's GB/s of short-lived
// span/JSON buffers, but the old gen must still hold Spark's execution
// memory (spark.memory.fraction 0.6 × heap of long-lived shuffle/sort
// buffers): at -Xmn = heap/2 the old gen was SMALLER than execution memory
// and shuffle-heavy stages spent 50-100% of task time in full GCs
// (measured via stage metrics, round 2).
val youngGen: Seq[String] = "^(\\d+)([gGmM])$".r
  .findFirstMatchIn(driverMem)
  .map { m =>
    val mb = m.group(1).toLong * (if (m.group(2).toLowerCase == "g") 1024L else 1L)
    Seq(s"-Xmn${math.max(mb / 4, 64L)}m")
  }
  .getOrElse(Seq.empty)
// GC selectable for experiments: GRAFT_GC=g1|parallel. G1 is the default:
// round-2 stage metrics showed ParallelGC spending up to 100% of task time
// in full GCs on shuffle-heavy stages (Tungsten execution pages churn the
// old gen, which ParallelGC only reclaims by full collection); G1 reclaims
// those regions incrementally and eliminated the GC time entirely.
val gcOpts: Seq[String] = sys.env.getOrElse("GRAFT_GC", "g1") match {
  case "parallel" => Seq("-XX:+UseParallelGC") ++ youngGen
  // MaxGCPauseMillis=2000 (vs the 200 ms default): G1 sizes eden DOWN to
  // meet the pause target, and at 32 allocation-heavy fetch threads the
  // default target shrank eden to ~1.6 GB → a young collection every
  // ~1.5 s, ~410 ms STW each, plus GCLocker-initiated stalls every time a
  // collection collided with the zstd/parquet JNI critical sections
  // 32 threads keep permanently busy. Measured (round 3, 9M-seed probe at
  // local[32]): 94.5 s total STW and 145 GCLocker GCs per bench run with
  // the default; 11.9 s and 16 with the 2 s target — fetch-stage GC share
  // fell from 57-70 % of task time to <10 %, round rate 50k → 86k urls/s.
  // local[8] was already <5 % GC, so the whole gain lands on the 4N side
  // of the N→4N scaling gate. A batch engine has no latency SLO: pause
  // tolerance buys eden, eden buys throughput.
  case _ => Seq("-XX:+UseG1GC", "-XX:MaxGCPauseMillis=2000")
}
// GC experiment hooks: GRAFT_GC_LOG=<path> writes a unified GC log;
// GRAFT_GC_OPTS passes free-form extra JVM flags (space-separated).
val extraJvm: Seq[String] =
  sys.env.get("GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p").toSeq ++
    sys.env.getOrElse("GRAFT_GC_OPTS", "").split(" ").filter(_.nonEmpty).toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
) ++ gcOpts ++ extraJvm
// Pre-touch the heap at startup for RUN mains (Bench/Verify/probes) —
// NOT tests (they never march eden far enough to care and would eat the
// startup cost on every CI run). This guest commits fresh pages through
// the hypervisor at only ~200 MB/s; without pre-touch that tax lands
// LAZILY inside the measured work as G1's eden rotates across the 32 GB
// heap: measured on the q30 k-means loop, per-call wall degraded 0.8 s →
// 4-6 s exactly when eden first marched past the touched prefix, and it
// never recovers within a session. Page faults are thread-independent
// serial cost, so as a FRACTION they depress the faster local[32] leg
// more — directly taxing the N→4N scaling gate. Pre-touch moves the
// whole commit to startup (32 g ≈ 2m40s; madvise-THP halves the fault
// count → ~1m20s) where no measurement sees it. Opt out with
// GRAFT_GC_OPTS="-XX:-AlwaysPreTouch" — the user flags are re-appended
// AFTER the pre-touch defaults here (later JVM flag wins), so the
// opt-out actually takes effect in run scope.
run / javaOptions ++=
  Seq("-XX:+AlwaysPreTouch", "-XX:+UseTransparentHugePages") ++ extraJvm
