package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions

/**
 * Driver contract (SURVEY.md §7.0): `entry` is the flagship query;
 * `queries` maps operator names (SURVEY.md §2) to DataFrame builders over
 * a testdata sf dir; `oracleSql` gives DuckDB-equivalent SQL per query.
 * Column names are aliased identically on both sides (driver hash-compares
 * by sorted column name).
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O13/§2.5 aggregates: classic scan→filter→agg (TPC-H Q1 shape).
    "q01_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // O5 host-dim normalization: custom Catalyst `etld1` expression over
    // synthesized hosts (store/store.go:339-344 semantics).
    "q02_etld1_hosts" -> ((s, dir) => {
      GraftExpressions.register(s)
      t(s, dir, "customer")
        .withColumn("host", concat(lit("www."), lower(col("c_name")), lit(".com")))
        .select(col("c_custkey"),
          GraftExpressions.etld1(col("host")).as("registrable"))
        .orderBy(col("c_custkey"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_etld1_hosts" ->
      """SELECT c_custkey, lower(c_name) || '.com' AS registrable
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
