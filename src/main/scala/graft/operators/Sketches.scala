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
