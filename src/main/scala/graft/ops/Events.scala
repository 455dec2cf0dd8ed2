package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-time operators over the `events` table: tumbling windows,
  * sessionization, and an as-of join — batch formulations of the
  * streaming-shaped workloads (the Structured Streaming twins live in
  * graft.streaming and share these semantics).
  *
  * All three are single-shuffle pipelines keyed on (window,type) or
  * user_id — the partitioning a 100 TB event log would already be stored
  * under (date/hour partitions, bucketed by user).
  */
object Events {

  /** Tumbling 1-hour windows per event_type: count + exact sums.
    * (events.value is generated with 2 decimals, so DECIMAL(12,2) is
    * lossless; min/max stay raw doubles — no arithmetic, no drift.)
    */
  def qEventTumbling(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("hour_start", "event_type")
  }

  /** Sessionization: a session breaks after a >30 min silence per user.
    * Pure aggregation formulation (no cumulative-window second pass):
    * n_sessions = count of gap-breaks + 1. Timestamps compared at whole
    * seconds (unix_timestamp ≡ floor(epoch)) so micro/nano precision
    * differences between engines cannot flip a boundary.
    */
  def qEventSessions(spark: SparkSession, dir: String): DataFrame = {
    // NB: ordered on (ts_sec, event_id) — the same whole-second key the
    // oracle uses — not raw ts, so sub-second precision can't reorder ties.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .withColumn("is_new",
        when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        max(col("gap")).as("max_gap_sec"))
      .orderBy("user_id")
  }

  /** As-of join: each 'view' event picks up the user's most recent
    * 'purchase' at-or-before it. Implemented with the union-tag trick —
    * one shuffle on user_id, then last(ignoreNulls) over the merged
    * timeline — the scalable batch form of an as-of join (no per-row
    * subquery, no range explosion). Ties at the same second resolve
    * purchase-before-view, then by event_id, deterministically.
    */
  def qEventAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "view"))
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("tag",
        when(col("event_type") === "purchase", 0).otherwise(1))
      .withColumn("p_id",
        when(col("event_type") === "purchase", col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_purchase", last(col("p_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        col("last_purchase"))
      .orderBy("event_id")
  }

  /** The same as-of join expressed through the custom Catalyst node
    * ([[graft.plans.AsOfJoinPlan]] + [[graft.plans.RewriteAsOfJoin]]) —
    * one declarative operator call instead of the hand-built union-tag
    * pipeline of [[qEventAsof]]; the rewrite rule lowers it to the
    * identical plan shape, and it shares that query's oracle semantics.
    */
  def qEventAsofPlan(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_sec").as("p_ts"),
        col("event_id").as("p_id"))
    graft.plans.AsOfJoin(views, purchases,
        key = "user_id", leftTime = "ts_sec", leftTie = "event_id",
        rightKey = "p_user", rightTime = "p_ts", rightTie = "p_id",
        payload = "p_id", outCol = "last_purchase")
      .orderBy("event_id")
  }

  /** MapType surface: parse the JSON props into MAP<STRING,BIGINT> and
    * exercise map_keys / element access / cardinality.
    */
  def qMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select(
        col("event_id"),
        element_at(map_keys(col("m")), 1).as("key0"),
        element_at(col("m"), "k").as("k_val"),
        size(map_keys(col("m"))).cast("long").as("n_keys"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "q_map_funcs" ->
      """SELECT event_id,
        |  json_keys(props)[1] AS key0,
        |  CAST(props->>'k' AS BIGINT) AS k_val,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q_event_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "q_event_sessions" ->
      """WITH t AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    ts_sec - lag(ts_sec, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts_sec ASC, event_id ASC) AS gap
        |  FROM t)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events,
        |  MAX(gap) AS max_gap_sec
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_event_asof_plan" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_id
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |lv AS (
        |  SELECT *, last_value(p_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_sec ASC, tag ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        |  FROM t)
        |SELECT event_id, user_id, ts_sec, last_purchase FROM lv
        |WHERE event_type = 'view' ORDER BY event_id""".stripMargin,
    "q_event_asof" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_id
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |lv AS (
        |  SELECT *, last_value(p_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_sec ASC, tag ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        |  FROM t)
        |SELECT event_id, user_id, ts_sec, last_purchase FROM lv
        |WHERE event_type = 'view' ORDER BY event_id""".stripMargin,
  )
}
