package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distinct-count sketches for corpus-scale cardinality questions
 * (distinct urls per host, distinct users per event class, vocabulary
 * size per shard) where an exact `count(distinct)` would shuffle every
 * key. Spark's built-in `approx_count_distinct` is HLL++ but its
 * register hashing is engine-private — unverifiable against an external
 * oracle. This is a DETERMINISTIC HyperLogLog (Flajolet et al. 2007)
 * over the repo's cross-engine md5 hash stream: both engines rebuild the
 * identical registers, so the sketch itself is hash-verified end to end
 * (SparkEntry q51), not just "close to exact".
 *
 * Layout: a 40-bit md5-derived hash; the top 10 bits pick one of
 * m = 1024 registers, the register holds max ρ (position of the first
 * 1-bit in the low 30 bits; all-zero ⇒ 31). The estimate is
 * α·m²/Σ2^(-ρ) with α in micro-units (720541 = round(1e6·0.7213 /
 * (1 + 1.079/1024))) and the harmonic sum carried as the EXACT integer
 * Σ2^(31-ρ) (≤ m·2^31 = 2^41, exact in a long AND in a double), so the
 * single final division is one correctly-rounded IEEE op on both
 * engines — no float accumulates in engine order.
 *
 * Shape at 100 TB: one map-side-combined groupBy(group, register) —
 * the shuffle carries at most m rows per group per mapper regardless of
 * input size — then an O(m)-per-group reduction. The exact
 * `count(distinct)` column exists only to ground the verification
 * (err_ppm); at corpus scale you drop it (`withExact = false`) and the
 * full-key shuffle with it.
 */
object Sketches {

  /** Registers (2^10) and the micro-unit HLL bias constant for m=1024. */
  val M = 1024
  val AlphaMicro = 720541L

  private def md5Bits40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** 60-bit md5-derived value — the cross-engine hash discipline
    * (DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`). */
  private def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /**
   * Count-Min Sketch heavy hitters (Cormode & Muthukrishnan 2005) over
   * the corpus token stream — the point-query frequency sketch a
   * pipeline uses where an exact `groupBy(token)` would shuffle the
   * whole vocabulary (stopword discovery, tokenizer-vocab seeding,
   * frequency-capped filtering). Deterministic like [[hllDistinct]]:
   * ONE md5 per token supplies all d row-hashes — row r's cell comes
   * from the digest's r-th disjoint 32-bit segment (disjoint bits of one
   * strong hash are the standard stand-in for d independent hashes) —
   * so both engines rebuild the identical d×w counter grid and the
   * estimate (min over the d cells) is hash-verified end to end,
   * including its signature one-sided error, surfaced as
   * `overcount = cms_est - exact_cnt ≥ 0`.
   *
   * Shape at 100 TB: hashing dominates the grid build, and the one-md5
   * layout costs exactly one digest per token (a per-row hash would pay
   * d×); the ×d explode feeds ONE map-side-combined groupBy whose
   * output is capped at d·w rows per mapper regardless of input size;
   * the probe side is a bounded dim
   * joined back to the ≤ d·w-row grid. The exact top-k count exists only
   * to ground verification — pass `candidates` (a `token`-column
   * DataFrame, e.g. a prior round's heavy hitters) to drop it and the
   * full-vocabulary shuffle with it: the output is then the pure sketch
   * estimate per candidate.
   *
   * Output: with exact grounding (candidates = None) — (token,
   * exact_cnt, cms_est, overcount) for the exact top-k, ordered by
   * (exact_cnt desc, token); with caller candidates — (token, cms_est)
   * ordered by (cms_est desc, token).
   */
  def countMinHeavyHitters(docs: DataFrame, d: Int = 4, w: Int = 1024,
                           k: Int = 20,
                           candidates: Option[DataFrame] = None): DataFrame = {
    require(d >= 1 && d <= 4, s"d=$d: one md5 yields 4 disjoint 32-bit segments")
    val toks = docs.select(
      explode(TextOps.tokens(col("text"))).as("token"))
    // ONE digest per token; (r, c) pairs from its disjoint hex segments
    val rcPairs = (t: Column) => {
      val h = md5(concat(lit("cms:"), t))
      posexplode(transform(sequence(lit(0), lit(d - 1)), r =>
        conv(h.substr(r * 8 + 1, lit(8)), 16, 10).cast("long") % w))
    }
    // grid: ≤ d·w rows survive the map-side combine per mapper
    val cells = toks
      .select(rcPairs(col("token")).as(Seq("r", "c")))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
    def estimate(probe: DataFrame): DataFrame = probe
      .select(probe.columns.map(col) :+ rcPairs(col("token")): _*)
      .withColumnRenamed("pos", "r")
      .withColumnRenamed("col", "c")
      .join(cells, Seq("r", "c"))
      .groupBy(probe.columns.map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
    candidates match {
      case Some(c) =>
        estimate(c.select("token"))
          .orderBy(col("cms_est").desc, col("token"))
      case None =>
        // exact counts ground the verification; top-k plans as
        // TakeOrderedAndProject (O(k) per partition, no global sort)
        val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("token")).limit(k)
        estimate(top)
          .select(col("token"), col("exact_cnt"), col("cms_est"),
            (col("cms_est") - col("exact_cnt")).as("overcount"))
          .orderBy(col("exact_cnt").desc, col("token"))
    }
  }

  /**
   * Deterministic histogram quantiles — the third member of the sketch
   * family (distinct → [[hllDistinct]], frequency →
   * [[countMinHeavyHitters]], quantiles → this): per-group p50/p90/p99
   * of the document token count from a fixed-width integer histogram,
   * where an exact quantile would sort every group. All arithmetic is
   * integer (bucket = n div width clamped to buckets-1; the
   * within-bucket interpolation is integer division), so the estimate
   * is hash-exact cross-engine.
   *
   * Shape at 100 TB: the histogram build is ONE map-side-combined
   * groupBy whose shuffle carries at most `buckets` rows per group per
   * mapper; the quantile extraction is per-group window algebra over a
   * ≤ `buckets`-row frame. The exact type-1 quantile (value at sorted
   * position ceil(p·N/100), ties by doc_id) exists only to ground
   * verification — `withExact = false` drops it and the per-group full
   * sort with it.
   *
   * Output per (group, pct): n_docs, est_tok, exact_tok, err =
   * est_tok − exact_tok, ordered by (group, pct).
   */
  def histogramQuantiles(docs: DataFrame, groupCol: String = "source",
                         pcts: Seq[Int] = Seq(50, 90, 99), width: Int = 4,
                         buckets: Int = 1024,
                         withExact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(groupCol).as("grp"), col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n"))
    val totals = base.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val hist = base
      .groupBy(col("grp"), expr(s"least(n div $width, ${buckets - 1})").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy("grp").orderBy("b")))
    val probes = totals.select(col("grp"), col("n_docs"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .withColumn("need", expr("(pct * n_docs + 99) div 100"))
    val est = probes.join(cum, Seq("grp"))
      .filter(col("cum") >= col("need"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp", "pct").orderBy("b")))
      .filter(col("rk") === 1)
      .select(col("grp"), col("pct"), col("n_docs"), col("need"),
        expr(s"b * $width + ((need - (cum - cnt) - 1) * $width) div cnt")
          .as("est_tok"))
    val out =
      if (!withExact)
        est.select(col("grp").as(groupCol), col("pct"), col("n_docs"),
          col("est_tok"))
      else {
        val ranked = base.withColumn("r", row_number().over(
          Window.partitionBy("grp").orderBy("n", "doc_id")))
        est.join(ranked,
            est("grp") === ranked("grp") && ranked("r") === est("need"))
          .select(est("grp").as(groupCol), col("pct"), col("n_docs"),
            col("est_tok"), col("n").as("exact_tok"),
            (col("est_tok") - col("n")).as("err"))
      }
    out.orderBy(groupCol, "pct")
  }

  /**
   * Per-group deterministic-HLL distinct estimate of `key`.
   *
   * Output per group: m, nonzero_registers, sum_inv (the exact integer
   * Σ2^(31-ρ) including 2^31 per empty register), est_micro (the HLL
   * raw estimate in micro-units), and — when `withExact` — the exact
   * distinct count plus err_ppm = |est − exact·1e6| div exact.
   */
  def hllDistinct(df: DataFrame, key: Column, groupCols: Seq[String],
                  withExact: Boolean = true): DataFrame = {
    val g = groupCols.map(col)
    val h = md5Bits40(concat(lit("hll:"), key))
    val low = h.bitwiseAND(lit((1L << 30) - 1))
    val rho = when(low === 0L, lit(31))
      .otherwise(lit(31) - length(bin(low)))
    val regs = df
      .select(g :+ shiftright(h, 30).as("register") :+ rho.as("rho"): _*)
      .groupBy((g :+ col("register")): _*)
      .agg(max(col("rho")).as("rho"))
    val sk = regs
      .groupBy(g: _*)
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(expr("shiftleft(1L, 31 - rho)")).as("sum_pres"))
      .select(g ++ Seq(
        lit(M).as("m"),
        col("nonzero_registers"),
        (col("sum_pres") + (lit(M.toLong) - col("nonzero_registers"))
          * lit(1L << 31)).as("sum_inv")): _*)
      // α·m²·2^31 = 720541·2^51: every factor and the product are exact
      // doubles (20-bit mantissa), so round(numer / sum_inv) is ONE
      // correctly-rounded division — bit-identical in DuckDB.
      .withColumn("est_micro",
        round(lit(AlphaMicro.toDouble) * lit(1048576.0) * lit(2147483648.0)
          / col("sum_inv").cast("double")).cast("long"))
    if (!withExact) sk
    else {
      val exact = df.groupBy(g: _*)
        .agg(countDistinct(key).as("exact_distinct"))
      sk.join(exact, groupCols)
        .withColumn("err_ppm",
          expr("abs(est_micro - exact_distinct * 1000000L) div exact_distinct"))
    }
  }
}
