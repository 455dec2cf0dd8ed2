package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The relational operator catalogue (SURVEY.md §2c): everything the
  * reference could only express as hand-written mapper/reducer pairs,
  * exposed natively and verified against a DuckDB oracle.
  *
  * Numeric-determinism rule used throughout: any aggregate over doubles is
  * computed in exact DECIMAL arithmetic and cast to DOUBLE at the end.
  * Floating-point summation is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's — exact decimal sums make the
  * result independent of partitioning (which also means stable under AQE
  * re-planning and at any cluster size), so the oracle hash matches.
  */
object Relational {

  /** Exact money/quantity arithmetic: all inputs are 2-decimal doubles. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def one: Column = lit(1).cast(DecimalType(12, 2))

  /** TPC-H Q1-style pricing summary — the flagship aggregate.
    * Map-side partial aggregation on (returnflag, linestatus) → 6-ish
    * groups, so the shuffle carries only partial states; scales to any
    * lineitem size.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
          * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Filter + projection; both the predicate and the 3-column read schema
    * must reach the parquet scan (PushedFilters / ReadSchema in explain).
    */
  def qFilterProject(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Revenue by nation/region — the canonical star join. nation/region are
    * tiny dims: broadcast them so the only shuffle is lineitem⋈orders⋈
    * customer on their keys. At 100 TB the fact-fact joins shuffle-hash/
    * sort-merge on the join key; the dims never shuffle.
    */
  def qJoinNationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = broadcast(Tables.nation(spark, dir))
    val r = broadcast(Tables.region(spark, dir))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q3-flavor shipping-priority query — the canonical 3-way
    * analytic join: selective filters on ALL THREE inputs (segment on
    * customer, date windows on orders/lineitem) reach the scans, the
    * filtered customer side broadcasts, and the top-10 lands in
    * TakeOrderedAndProject — no global sort, no unfiltered scan.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-07-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "MACHINERY")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("order_date").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  /** Left outer join keeping customers with zero orders. */
  def qJoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0))
          .as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Left-semi: customers that have at least one high-priority order. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Left-anti: customers with no orders at all. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Distinct over a low-cardinality pair — hash-aggregate, no sort. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Top-k by aggregate: Spark plans the final orderBy+limit as a
    * TakeOrderedAndProject — each partition keeps only its top 10, the
    * driver merges k·P rows, never the full result. Tie-broken on the key
    * so the oracle compare is deterministic.
    */
  def qTopKCustomers(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  /** Window: rank + top-3 orders per customer (row_number with a unique
    * tiebreak). One shuffle on the partition key; the per-partition sort
    * is bounded by the window spec.
    */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Window: lag — per-customer order-over-order price delta. */
  def qWindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Window: running (cumulative) sum with an explicit rows frame.
    * Decimal accumulation so the running values are exact at every row.
    */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP: subtotals + grand total. Spark expands grouping sets in a
    * single pass (Expand → one shuffle), not one job per level.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** CUBE over two independent dims. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** UNION (distinct) of two key sets. */
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .union(c.filter(col("c_acctbal") > 9000).select(col("c_custkey")))
      .distinct()
      .orderBy("c_custkey")
  }

  /** INTERSECT of two key sets. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
      .orderBy("c_custkey")
  }

  /** EXCEPT: customers minus those holding an open ('O') order. */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.select(col("c_custkey"))
      .except(o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  /** String function battery (all codegen'd builtins, no UDFs). */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
      .orderBy("p_partkey")
  }

  /** Date/time function battery over o_orderdate. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("due_date"))
      .orderBy("o_orderkey")
  }

  /** Math function battery — only IEEE-exact ops (sqrt, floor, ceil, abs,
    * integer modulo), so doubles match the oracle bit-for-bit.
    */
  def qMathFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        (col("l_orderkey") % 7).as("key_mod"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))
      .orderBy("l_orderkey")
  }

  /** JSON extraction from the events.props payload column. */
  def qJsonEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("k_sum"),
        max(col("k_val")).as("k_max"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** Exact distinct count (shuffle on the distinct key, then count). */
  def qCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** HLL approximate distinct, accuracy-gated: the sketch estimate itself
    * can't be reproduced in SQL (sketch internals differ across engines),
    * so the query emits the exact count plus a boolean asserting the HLL
    * estimate landed within 2% of it — which the oracle pins to TRUE.
    * That upgrades the old rows-only check to a real gate on estimator
    * accuracy. At 100 TB the sketch replaces the exact-distinct shuffle
    * with a constant-size mergeable state per group.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        count_distinct(col("l_partkey")).as("n_parts"))
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("approx_parts") - col("n_parts"))
          <= col("n_parts").cast("double") * 0.02).as("approx_ok"))
      .orderBy("l_returnflag")
  }
}
