package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Data-quality operators: column profiling and declarative constraint
  * checking — the validation pass every ingest pipeline runs before
  * trusting a new batch.
  */
object Profile {

  /** Long-format numeric profile — per column: non-null count, null
    * count, exact distinct count, min/max, exact DECIMAL sum. ONE scan
    * of the table: all per-column aggregates ride a single global agg
    * (map-side partials, a one-row shuffle), then a narrow explode
    * unpivots the single row to long format. The exact distincts are
    * the one at-scale caveat: k distinct aggregates in one pass cost an
    * Expand (×k row multiplication before the shuffle); at 100 TB you
    * flip them to `approx_count_distinct` (same plan minus Expand, the
    * `q_approx_distinct` pattern) — the profile shape doesn't change.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Same operator over any frame and numeric column list. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__ndist"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(DecimalType(18, 2))).cast("double").as(s"${c}__sum"))
    }
    val structs = cols.map { c =>
      s"struct('$c' AS col_name, ${c}__n AS n_values, ${c}__nnull AS n_nulls, " +
        s"${c}__ndist AS n_distinct, ${c}__min AS min_value, " +
        s"${c}__max AS max_value, ${c}__sum AS sum_value)"
    }.mkString("array(", ", ", ")")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(expr(structs)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** Declarative constraint check: row-level rules evaluate in ONE
    * conditional-sum pass over the fact table; the referential rule is
    * one anti-join (at scale: broadcast the key side if it fits, else a
    * plain shuffle join — either way no second fact scan for the
    * row-level rules). Output is (rule, n_violations), zero rows
    * nowhere — a clean batch reports explicit zeros.
    */
  def qConstraints(spark: SparkSession, dir: String): DataFrame =
    constraintsOf(Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  /** Same rules over any (lineitem-shaped, orders-shaped) frames. */
  def constraintsOf(li: DataFrame, o: DataFrame): DataFrame = {
    val rowRules = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("r_qty_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("r_discount_range"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
        .as("r_shipdate_null"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
        .as("r_price_positive"))
    val orphans = li.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("r_orderkey_orphan"))
    rowRules.crossJoin(orphans)
      .select(explode(expr(
        """array(
          |  struct('discount_range' AS rule, r_discount_range AS n_violations),
          |  struct('orderkey_orphan' AS rule, r_orderkey_orphan AS n_violations),
          |  struct('price_positive' AS rule, r_price_positive AS n_violations),
          |  struct('qty_range' AS rule, r_qty_range AS n_violations),
          |  struct('shipdate_null' AS rule, r_shipdate_null AS n_violations))""".stripMargin)).as("p"))
      .select(col("p.*"))
      .orderBy("rule")
  }

  /** Mergeable-sketch rollup — the 100 TB distinct-count pattern: each
    * shard builds an HLL sketch independently (here: per l_returnflag
    * group via `hll_sketch_agg`), and the corpus-wide estimate comes
    * from UNIONING the sketches (`hll_union_agg`), never from
    * re-scanning rows. That mergeability is what lets a pipeline keep
    * per-partition/per-day sketches materialized and answer global
    * distinct questions incrementally. Output pins the exact count and
    * a within-2%% accuracy flag (the estimate itself is
    * sketch-seed-dependent, so the flag — not the estimate — is the
    * oracle-stable value, same contract as `q_approx_distinct`).
    */
  def qSketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perShard = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), 12).as("sk"))
    val merged = perShard.agg(
      count(lit(1)).as("n_shards"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_union"))
    val exact = li.agg(count_distinct(col("l_partkey")).as("n_exact"))
    merged.crossJoin(exact)
      .select(col("n_shards"), col("n_exact"),
        (abs(col("approx_union") - col("n_exact"))
          <= col("n_exact").cast("double") * 0.02).as("union_ok"))
  }

  val oracles: Map[String, String] = Map(
    "q_sketch_union" ->
      """SELECT
        |  (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem) AS n_shards,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |  TRUE AS union_ok
        |FROM lineitem""".stripMargin,
    "q_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val agg = cols.map { c =>
        s"""  COUNT($c) AS ${c}__n,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}__nnull,
           |  COUNT(DISTINCT $c) AS ${c}__ndist,
           |  CAST(MIN($c) AS DOUBLE) AS ${c}__min,
           |  CAST(MAX($c) AS DOUBLE) AS ${c}__max,
           |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS ${c}__sum""".stripMargin
      }.mkString(",\n")
      val arms = cols.map { c =>
        s"SELECT '$c' AS col_name, ${c}__n AS n_values, ${c}__nnull AS n_nulls, " +
          s"${c}__ndist AS n_distinct, ${c}__min AS min_value, " +
          s"${c}__max AS max_value, ${c}__sum AS sum_value FROM p"
      }.mkString("\nUNION ALL\n")
      s"""WITH p AS (\n  SELECT\n$agg\n  FROM lineitem)\n$arms\nORDER BY col_name"""
    },
    "q_constraints" ->
      """WITH rowr AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS r_qty_range,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS r_discount_range,
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_shipdate_null,
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS r_price_positive
        |  FROM lineitem),
        |orph AS (
        |  SELECT COUNT(*) AS r_orderkey_orphan FROM lineitem l
        |  WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT 'discount_range' AS rule, r_discount_range AS n_violations FROM rowr
        |UNION ALL SELECT 'orderkey_orphan', r_orderkey_orphan FROM orph
        |UNION ALL SELECT 'price_positive', r_price_positive FROM rowr
        |UNION ALL SELECT 'qty_range', r_qty_range FROM rowr
        |UNION ALL SELECT 'shipdate_null', r_shipdate_null FROM rowr
        |ORDER BY rule""".stripMargin)
}
