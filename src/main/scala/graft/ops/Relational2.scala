package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Second tranche of the relational catalogue: grouping sets, correlated
  * and scalar subqueries, non-equi (range/band) joins, pivot, exact
  * percentile — the remaining SQL-surface rows of SURVEY.md §2c.
  *
  * Queries that are most naturally SQL (grouping sets, EXISTS, scalar
  * subqueries) register temp views and go through spark.sql — the SQL
  * text is shared almost verbatim with the DuckDB oracle, which is itself
  * part of the parity story.
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  /** Explicit GROUPING SETS (beyond rollup/cube): one Expand + one
    * shuffle regardless of how many sets.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin)
  }

  /** Correlated EXISTS — planned as a left-semi join, one shuffle. */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Scalar subquery threshold (broadcast as a literal after the subquery
    * executes — no per-row recomputation).
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Non-equi band join: lineitem quantities into inline quantity bands.
    * The band table is tiny → broadcast nested-loop join, which is the
    * right plan; the fact side streams through without a shuffle.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = broadcast(Seq(
      (0, 10, "low"), (10, 25, "mid"), (25, 40, "high"), (40, 51, "max"))
      .toDF("lo", "hi", "band"))
    val l = Tables.lineitem(spark, dir)
    l.join(bands, l("l_quantity") > col("lo") && l("l_quantity") <= col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("band")
  }

  /** Pivot (native Spark pivot API, absent combos coalesced to 0 to match
    * the conditional-aggregation oracle formulation).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("o_orderpriority")
  }

  /** Exact interpolated median per group (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), rounded to absorb interpolation ulp differences.
    */
  def qMedian(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"))
      .orderBy("l_returnflag")
  }

  val oracles: Map[String, String] = Map(
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin,
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_range_join" ->
      """SELECT band, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN (VALUES (0, 10, 'low'), (10, 25, 'mid'), (25, 40, 'high'),
        |             (40, 51, 'max')) b(lo, hi, band)
        |  ON l_quantity > lo AND l_quantity <= hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin,
    "q_median" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
  )
}
