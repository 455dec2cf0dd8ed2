package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Seventh tranche: the native session_window operator, the spark.sql SQL
  * entry point (composite TPC-H-style query over temp views), correlated
  * LATERAL joins, and bitwise / interval arithmetic batteries.
  */
object Relational7 {

  /** Spark's native `session_window` generator — THE built-in
    * sessionization operator (dynamic-gap windows merged per key in one
    * shuffle). Timestamps floor to whole seconds first so the 30-minute
    * gap boundary is engine-exact; a gap of exactly 1800 s starts a new
    * session on both sides ([start, last+gap) merge semantics).
    */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("tss", expr("timestamp_seconds(unix_timestamp(ts))"))
      .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** The SQL entry point: every table a user-facing temp view, the query
    * itself ANSI SQL through spark.sql — proof the engine's surface
    * includes plain SQL, planned by the same Catalyst pipeline as the
    * DataFrame API (identical physical plans).
    */
  def qSqlEntry(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    spark.sql(
      """SELECT c_mktsegment, o_orderpriority,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM v_lineitem
        |JOIN v_orders ON l_orderkey = o_orderkey
        |JOIN v_customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)
  }

  /** Correlated LATERAL join: top-2 orders per rich customer via a
    * per-row correlated subquery with ORDER BY + LIMIT — the
    * "top-N per group as a join" shape (Catalyst plans it as a
    * window-ranked join, not a per-row re-scan).
    */
  def qLateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM v_customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM v_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c.c_acctbal > 9500
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
  }

  /** Bitwise battery: and / or / xor / shifts on the key column. */
  def qBitwise(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        expr("l_orderkey & 255").as("b_and"),
        expr("l_orderkey | 16").as("b_or"),
        expr("l_orderkey ^ 85").as("b_xor"),
        expr("shiftleft(l_orderkey, 2)").as("b_shl"),
        expr("shiftright(l_orderkey, 1)").as("b_shr"))
      .orderBy("l_orderkey")
  }

  /** Interval arithmetic on timestamps: +90 minutes, -1 day, timestamp
    * diff in minutes — all at whole-second precision.
    */
  def qIntervalArith(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("tss", expr("timestamp_seconds(unix_timestamp(ts))"))
      .select(col("event_id"),
        date_format(expr("tss + INTERVAL 90 MINUTE"), "yyyy-MM-dd HH:mm:ss")
          .as("plus90m"),
        date_format(expr("tss - INTERVAL 1 DAY"), "yyyy-MM-dd HH:mm:ss")
          .as("minus1d"),
        expr("CAST(unix_timestamp(ts) div 60 AS BIGINT)").as("epoch_min"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "q_session_window" ->
      """WITH t AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
        |g AS (
        |  SELECT user_id, s,
        |    CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
        |         OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s) >= 1800
        |      THEN 1 ELSE 0 END AS brk
        |  FROM t),
        |i AS (
        |  SELECT user_id, s,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id,
        |  strftime(to_timestamp(MIN(s)), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(to_timestamp(MAX(s) + 1800), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  COUNT(*) AS n_events
        |FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_sql_entry" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c.c_acctbal > 9500
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,
    "q_bitwise" ->
      """SELECT l_orderkey,
        |  l_orderkey & 255 AS b_and,
        |  l_orderkey | 16 AS b_or,
        |  xor(l_orderkey, 85) AS b_xor,
        |  l_orderkey << 2 AS b_shl,
        |  l_orderkey >> 1 AS b_shr
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "q_interval_arith" ->
      """SELECT event_id,
        |  strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) + INTERVAL 90 MINUTE,
        |    '%Y-%m-%d %H:%M:%S') AS plus90m,
        |  strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) - INTERVAL 1 DAY,
        |    '%Y-%m-%d %H:%M:%S') AS minus1d,
        |  CAST(floor(epoch(ts)) AS BIGINT) // 60 AS epoch_min
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
