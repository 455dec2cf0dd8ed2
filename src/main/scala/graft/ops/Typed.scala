package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset surface: case-class/tuple Encoders, groupByKey, and the
  * bounded-state [[graft.functions.TopKAggregator]] — the Dataset[T] API
  * lane of SURVEY §2c's UDAF row, driver-gated.
  */
object Typed {

  /** Top-2 orders per priority through the typed Aggregator: state is a
    * k-capped sorted list, so partial aggregation ships O(groups·k)
    * rows — the scalable alternative to the window formulation, which
    * shuffles every row. Output explodes back to one row per ranked
    * order; ordering (score DESC, id ASC) is deterministic under any
    * merge order, so the window-ranked SQL oracle reproduces it exactly.
    */
  def qTopKTyped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(2).toColumn.name("topk"))
      .flatMap { case (prio, items) =>
        items.map { case (id, price) => (prio, id, price) }
      }
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Typed cogroup — the MapReduce "reducer over two tagged streams"
    * primitive (how the reference would express a join: tag-union →
    * shuffle on key → per-group custom logic). Both sides shuffle once
    * on the key; the lambda sees each side's full group. Emits per-key
    * order counts with a customer-presence flag, reproducible as a
    * FULL OUTER aggregate in SQL.
    */
  def qCogroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)]
      .groupByKey(_._1)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name")).as[(Long, String)]
      .groupByKey(_._1)
    o.cogroup(c) { (k, os, cs) =>
        Iterator((k, os.size.toLong, cs.nonEmpty))
      }
      .toDF("custkey", "n_orders", "has_customer")
      .orderBy("custkey")
  }

  val oracles: Map[String, String] = Map(
    "q_cogroup" ->
      """SELECT coalesce(o.k, c.c_custkey) AS custkey,
        |  coalesce(o.n, 0) AS n_orders,
        |  c.c_custkey IS NOT NULL AS has_customer
        |FROM (SELECT o_custkey AS k, COUNT(*) AS n
        |      FROM orders GROUP BY o_custkey) o
        |FULL JOIN customer c ON o.k = c.c_custkey
        |ORDER BY custkey""".stripMargin,
    "q_topk_typed" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 2
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
  )
}
