package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Fifth tranche: generator output (posexplode), unpivot/melt, the array
  * function battery, deterministic hash sampling, accuracy-gated approx
  * quantiles, and RANGE-frame windows — the remaining §2c categories that
  * had spec coverage but no driver-gated query.
  */
object Relational5 {

  /** posexplode as a first-class query: token + 0-based position out of
    * the generator, filtered and re-aggregated. One shuffle on the token.
    */
  def qExplodeTokens(spark: SparkSession, dir: String): DataFrame = {
    Tables.documentsSpread(spark, dir)
      .select(posexplode(split(lower(col("text")), " ", -1)).as(Seq("pos", "t")))
      .filter(length(col("t")) >= 8)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"), min(col("pos")).cast("long").as("first_pos"))
      .orderBy("t")
  }

  /** Unpivot / melt: wide measure columns to long (variable, value) rows.
    * Narrow per-row transform — no shuffle at all until the final sort.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .orderBy("l_orderkey", "measure")
  }

  /** Array-function battery over the token array: size / contains /
    * position / element_at (positive and negative) / array_min /
    * array_distinct / slice — the ArrayType surface a list-typed column
    * needs. All map-side; one narrow projection.
    */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.documentsSpread(spark, dir)
      .withColumn("w", split(lower(col("text")), " ", -1))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        array_contains(col("w"), "the").as("has_the"),
        array_position(col("w"), "the").as("pos_the"),
        element_at(col("w"), 1).as("first_tok"),
        element_at(col("w"), -1).as("last_tok"),
        array_min(col("w")).as("min_tok"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        concat_ws("|", slice(col("w"), 1, 3)).as("head3"))
      .orderBy("doc_id")
  }

  /** Deterministic 10% hash sample: rows whose Knuth-multiplicative hash
    * of the key ≡ 0 (mod 10), then an exact aggregate over the sample.
    * This is the scalable sampling idiom — reproducible across
    * runs/engines, embarrassingly parallel, no reservoir state — unlike
    * `sample()`, whose RNG cannot match any oracle. Pure 64-bit integer
    * arithmetic (identical text on both engines), so the filter costs a
    * multiply, not an md5.
    */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame = {
    val h = "((l_orderkey * 2654435761) % 4294967296)"
    Tables.lineitem(spark, dir)
      .filter(expr(s"$h % 10 = 0"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("l_quantity").cast(DecimalType(12, 2))).cast("double")
          .as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Approx quantiles, accuracy-gated like q_approx_distinct: the t-digest
    * style estimate itself isn't reproducible in SQL, so the query emits
    * the exact p50 plus a boolean asserting the estimate landed within 1%
    * — pinned TRUE by the oracle. At 100 TB approx_percentile replaces
    * the full-sort exact percentile with a bounded-size mergeable sketch.
    */
  def qApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("exact_p50"),
        expr("approx_percentile(l_extendedprice, 0.5D, 10000)").as("ap"))
      .select(col("l_returnflag"),
        round(col("exact_p50"), 6).as("p50"),
        (abs(col("ap") - col("exact_p50")) <= col("exact_p50") * 0.01)
          .as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** RANGE-frame window: per-customer trailing-7-day spend, ordered by an
    * integer day offset so the frame is a value range, not a row count.
    * One shuffle on the partition key; the frame is computed in a single
    * per-partition sorted pass.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-6, 0)
    Tables.orders(spark, dir)
      .withColumn("d", datediff(col("o_orderdate"), lit("1990-01-01")))
      .withColumn("spend7d",
        sum(col("o_totalprice").cast(DecimalType(12, 2))).over(w)
          .cast("double"))
      .select(col("o_orderkey"), col("spend7d"))
      .orderBy("o_orderkey")
  }

  val oracles: Map[String, String] = Map(
    "q_explode_tokens" ->
      """SELECT t, COUNT(*) AS n, MIN(pos) AS first_pos FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS t,
        |    CAST(generate_subscripts(string_split(lower(text), ' '), 1) - 1
        |      AS BIGINT) AS pos
        |  FROM documents)
        |WHERE length(t) >= 8 GROUP BY t ORDER BY t""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, measure, val FROM (
        |  UNPIVOT (SELECT l_orderkey, l_quantity, l_extendedprice, l_discount
        |           FROM lineitem WHERE l_linenumber = 1)
        |  ON l_quantity, l_extendedprice, l_discount
        |  INTO NAME measure VALUE val)
        |ORDER BY l_orderkey, measure""".stripMargin,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  len(w) AS n_tokens,
        |  list_contains(w, 'the') AS has_the,
        |  CAST(coalesce(list_position(w, 'the'), 0) AS BIGINT) AS pos_the,
        |  w[1] AS first_tok,
        |  w[-1] AS last_tok,
        |  list_min(w) AS min_tok,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |  array_to_string(w[1:3], '|') AS head3
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_sample_hash" -> {
      val h = "((l_orderkey * 2654435761) % 4294967296)"
      s"""SELECT l_returnflag, COUNT(*) AS n_sampled,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         |FROM lineitem WHERE $h % 10 = 0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "q_approx_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY d
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend7d
        |FROM (SELECT *, date_diff('day', DATE '1990-01-01',
        |        CAST(o_orderdate AS DATE)) AS d
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
