package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Third relational tranche: multiset set-ops, the full ranking-function
  * battery, sliding event-time windows, and histogram bucketing.
  */
object Relational3 {

  /** EXCEPT ALL — multiset difference (duplicates preserved). */
  def qExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.select(col("l_suppkey"))
      .exceptAll(l.filter(col("l_returnflag") === "R").select(col("l_suppkey")))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .orderBy("l_suppkey")
  }

  /** INTERSECT ALL — multiset intersection. */
  def qIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_linenumber") <= 2).select(col("l_suppkey"))
      .intersectAll(l.filter(col("l_quantity") > 25).select(col("l_suppkey")))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .orderBy("l_suppkey")
  }

  /** The ranking-function battery: dense_rank, percent_rank, ntile,
    * cume_dist, first/last/nth value over an explicit frame — one window
    * spec, one shuffle.
    */
  def qWindowBattery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        ntile(4).over(w).cast("long").as("quartile"),
        cume_dist().over(w).as("cdist"),
        first_value(col("o_orderkey")).over(wf).as("first_key"),
        last_value(col("o_orderkey")).over(wf).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_key"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Sliding event-time windows (1 h length, 30 min slide) in batch form:
    * each event belongs to 2 overlapping windows, generated per-row and
    * exploded — the batch twin of `window(ts, '1 hour', '30 minutes')`,
    * written with explicit epoch arithmetic so the oracle is exact.
    */
  def qEventSliding(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(col("event_type"), col("sec"),
        explode(expr(
          "array(CAST(sec div 1800 AS BIGINT) * 1800 - 1800, CAST(sec div 1800 AS BIGINT) * 1800)"))
          .as("win_start"))
      .filter(col("sec") >= col("win_start")
        && col("sec") < col("win_start") + 3600)
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_start", "event_type")
  }

  /** Histogram: fixed-width value buckets via integer arithmetic
    * (width 10 over [0, 200); out-of-range clamps to the edge buckets,
    * mirroring width_bucket semantics without relying on per-engine
    * float edge behavior).
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("bucket",
        least(greatest(floor(col("value") / 10.0).cast("long"), lit(0L)), lit(19L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .orderBy("bucket")
  }

  val oracles: Map[String, String] = Map(
    "q_except_all" ->
      """SELECT l_suppkey, COUNT(*) AS cnt FROM (
        |  SELECT l_suppkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_suppkey, COUNT(*) AS cnt FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_linenumber <= 2
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_window_battery" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  percent_rank() OVER w AS prank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  cume_dist() OVER w AS cdist,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey) OVER wf AS last_key,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key
        |FROM orders WHERE o_orderkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC),
        |       wf AS (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice ASC, o_orderkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_event_sliding" ->
      """SELECT win_start, event_type, COUNT(*) AS n_events FROM (
        |  SELECT event_type, sec,
        |    unnest([CAST(sec // 1800 AS BIGINT) * 1800 - 1800,
        |            CAST(sec // 1800 AS BIGINT) * 1800]) AS win_start
        |  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |        FROM events))
        |WHERE sec >= win_start AND sec < win_start + 3600
        |GROUP BY win_start, event_type ORDER BY win_start, event_type"""
        .stripMargin,
    "q_histogram" ->
      """SELECT bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT least(greatest(CAST(floor(value / 10.0) AS BIGINT), 0), 19) AS bucket, value
        |      FROM events)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
