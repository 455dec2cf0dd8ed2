package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Sixth tranche: statistical aggregates (exact-moment formulation),
  * second string/date batteries, map higher-order functions, conditional
  * counting, null-preserving explode, union-by-name, and a CSV sink
  * round-trip — closing the remaining §2c gaps.
  */
object Relational6 {

  /** Statistical aggregates — var/stddev/corr — computed from exact
    * DECIMAL moment sums (n, Σx, Σx², Σy, Σy², Σxy) combined in double
    * arithmetic with an identical formula on the oracle side. Spark's
    * builtin stddev/corr use order-dependent streaming updates that can
    * differ in the last ulp across engines; the moment formulation is
    * order-independent AND the classic scalable shape (one map-side
    * partial agg, constant state per group).
    */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    def d(c: String) = col(c).cast(DecimalType(12, 2))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(d("l_quantity")).cast("double").as("sx"),
        sum(d("l_quantity") * d("l_quantity")).cast("double").as("sxx"),
        sum(d("l_extendedprice")).cast("double").as("sy"),
        sum(d("l_extendedprice") * d("l_extendedprice")).cast("double").as("syy"),
        sum(d("l_quantity") * d("l_extendedprice")).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxx") - col("sx") * col("sx"))
          / (col("n") * (col("n") - 1)), 6).as("var_qty"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          / (col("n") * (col("n") - 1))), 6).as("stddev_qty"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Second string battery: levenshtein / translate / lpad / rpad /
    * instr / reverse / repeat / left / right.
    */
  def qStringFuncs2(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
        translate(col("p_brand"), "#", "-").as("brand_tr"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        reverse(col("p_brand")).as("brand_rev"),
        expr("repeat('-', CAST(p_partkey % 4 AS INT))").as("dashes"),
        expr("left(p_name, 6)").as("name_l6"),
        expr("right(p_type, 4)").as("type_r4"))
      .orderBy("p_partkey")
  }

  /** Second date battery: add_months / last_day / quarter / dayofyear /
    * dayofweek / weekofyear (DuckDB's dayofweek is 0-based — the oracle
    * adds 1 to match Spark's 1=Sunday convention).
    */
  def qDateFuncs2(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
          .as("month_end"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"))
      .orderBy("o_orderkey")
  }

  /** Conditional aggregation: count_if / filtered counts per group —
    * map-side combinable, same shuffle as a plain count.
    */
  def qCountIf(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("count_if(l_discount > 0.05)").as("n_discounted"),
        expr("count_if(l_quantity >= 25)").as("n_bulk"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Map higher-order functions over the JSON props map:
    * transform_values / map_filter / map_keys — the oracle replays the
    * semantics with JSON lambdas (no map type needed on that side).
    */
  def qMapHof(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select(col("event_id"),
        element_at(expr("transform_values(m, (k, v) -> v * 2)"), "k")
          .as("k2"),
        expr("CAST(size(map_filter(m, (k, v) -> v > 10)) AS BIGINT)")
          .as("n_gt10"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"))
      .orderBy("event_id")
  }

  /** Null-preserving explode: docs with no long token still emit one
    * (null) row — the LEFT JOIN LATERAL shape.
    */
  def qExplodeOuter(spark: SparkSession, dir: String): DataFrame = {
    Tables.documentsSpread(spark, dir)
      .withColumn("a", expr(
        "filter(split(lower(text), ' ', -1), t -> length(t) >= 8)"))
      .select(col("doc_id"), explode_outer(col("a")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("tok")).as("n_long"))
      .orderBy("doc_id")
  }

  /** unionByName: the two branches project the same columns in different
    * order; position-based union would scramble them.
    */
  def qUnionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val rich = c.filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_acctbal"), col("c_custkey")) // reversed on purpose
    rich.unionByName(building)
      .groupBy((floor(col("c_acctbal") / 1000) * 1000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey")).as("key_sum"))
      .orderBy("bal_bucket")
  }

  /** Error-safe expressions: try_cast on castable and uncastable
    * strings, try_divide's null-on-zero — the ANSI-mode-safe surface
    * that keeps a 100 TB job from dying on one malformed row.
    */
  def qTryFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        expr("try_cast(CAST(p_partkey AS STRING) AS INT)").cast("long")
          .as("key_roundtrip"),
        expr("try_cast(p_name AS INT)").cast("long").as("name_as_int"),
        expr("try_cast(substring(p_type, 1, 2) AS DOUBLE)").as("type_pfx_num"),
        expr("try_divide(CAST(p_partkey AS DOUBLE), CAST(p_partkey % 3 AS DOUBLE))")
          .as("div_or_null"))
      .orderBy("p_partkey")
  }

  val oracles: Map[String, String] = Map(
    "q_try_funcs" ->
      """SELECT p_partkey,
        |  CAST(TRY_CAST(CAST(p_partkey AS VARCHAR) AS INT) AS BIGINT)
        |    AS key_roundtrip,
        |  CAST(TRY_CAST(p_name AS INT) AS BIGINT) AS name_as_int,
        |  TRY_CAST(substring(p_type, 1, 2) AS DOUBLE) AS type_pfx_num,
        |  CASE WHEN p_partkey % 3 = 0 THEN NULL
        |       ELSE CAST(p_partkey AS DOUBLE) / CAST(p_partkey % 3 AS DOUBLE)
        |  END AS div_or_null
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_stats_agg" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxx - sx * sx) / (n * (n - 1)), 6) AS var_qty,
        |  round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS stddev_qty,
        |  round((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        |    AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
        |  translate(p_brand, '#', '-') AS brand_tr,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |  rpad(p_brand, 12, '.') AS brand_rpad,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
        |  reverse(p_brand) AS brand_rev,
        |  repeat('-', CAST(p_partkey % 4 AS INT)) AS dashes,
        |  left(p_name, 6) AS name_l6,
        |  right(p_type, 4) AS type_r4
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_count_if" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
        |  COUNT(*) FILTER (l_quantity >= 25) AS n_bulk,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_map_hof" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k2,
        |  CAST(len(list_filter(json_keys(props),
        |    kk -> CAST(json_extract_string(props, '$.' || kk) AS BIGINT) > 10))
        |    AS BIGINT) AS n_gt10,
        |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv
        |FROM events ORDER BY event_id""".stripMargin,
    "q_explode_outer" ->
      """SELECT doc_id, COUNT(*) AS n_rows, COUNT(tok) AS n_long FROM (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(a) = 0 THEN [NULL] ELSE a END) AS tok
        |  FROM (SELECT doc_id,
        |          list_filter(string_split(lower(text), ' '),
        |            t -> length(t) >= 8) AS a
        |        FROM documents))
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_union_by_name" ->
      """SELECT CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_bucket,
        |  COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY bal_bucket""".stripMargin,
  )
}
