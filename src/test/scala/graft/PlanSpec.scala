package graft

import graft.frontier.Frontier
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan quality gates — the scale properties the engine claims
 * must be visible in `explain`, not just hoped for:
 *  - parquet scans push filters and prune columns;
 *  - the frontier pop plans exactly ONE exchange (both politeness windows
 *    reuse the host_bucket partitioning);
 *  - the broadcast side of similarity search actually broadcasts;
 *  - custom expressions stay inside whole-stage codegen.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 scan: filter pushed to parquet, columns pruned") {
    val df = SparkEntry.queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$plan")
    // projection pruning: the scan must NOT read unused lineitem columns
    assert(!plan.contains("l_comment") && !plan.contains("l_partkey"),
      "scan reads columns the query never uses")
  }

  test("frontier pop plans exactly one exchange (shared window partitioning)") {
    import spark.implicits._
    val f = Frontier.normalizeCandidates(
      (0 until 100).map(i => (s"http://h${i % 7}.test/p/$i", 0, i.toLong))
        .toDF("url", "depth", "discovered_at"), 8)
    val popped = Frontier.pop(f, "fifo", 42L, 2, 1000)
    val plan = planOf(popped)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one exchange for the frontier input itself (normalizeCandidates'
    // groupBy) + exactly one for the pop repartition — the two windows
    // must NOT add more
    assert(exchanges <= 2, s"pop added extra exchanges ($exchanges):\n$plan")
    assert(plan.contains("Window"), "expected window operators")
  }

  test("bruteForceTopK broadcasts the query side") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = planOf(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), 5))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
  }

  test("custom expressions run inside WholeStageCodegen") {
    graft.functions.GraftExpressions.register(spark)
    // over a real scan (a literal input constant-folds to LocalTableScan —
    // which itself shows the expression is a first-class Catalyst citizen)
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(graft.functions.GraftExpressions.etld1(
        concat(lower(col("c_name")), lit(".example.co.uk"))).as("r"))
    val plan = planOf(df)
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string;
    // the etld1 Project must carry one
    assert(plan.linesIterator.exists(l => l.contains("etld1") && l.contains("*(")),
      s"etld1 fell out of codegen:\n$plan")
    assert(df.limit(1).collect().head.getString(0).endsWith("example.co.uk"))
  }

  test("docs() reads only requested columns (wide-file column pruning)") {
    // build a tiny crawl, then check the session projection prunes spans
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val sim = new graft.fetch.FetchSim(chainLength = 3)
    val c = new graft.pipeline.Crawler(spark, dir, sim,
      graft.pipeline.CrawlConfig(4, 10, 100))
    c.addSeeds(Seq("http://chain.test/p/0"))
    c.round()
    val plan = planOf(c.sessions())
    assert(!plan.contains("spans"), s"sessions() scan reads spans:\n$plan")
  }
}
