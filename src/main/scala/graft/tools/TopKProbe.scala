package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew probe for per-group top-k: ONE hot stratum (every row in the
  * same group — few-groups top-k at its worst), measured in both
  * formulations:
  *
  *  - window: `row_number() OVER (PARTITION BY g ORDER BY v DESC, id)`
  *    + `rk <= k` filter. Naively this hashes the entire stratum to one
  *    task and sorts it there — but Catalyst's rank-limit pushdown
  *    rewrites it to a PARTIAL `WindowGroupLimit`, which keeps ≤ k
  *    candidates per map partition BEFORE the exchange, making the
  *    declarative form bounded exactly like a hand-built top-k
  *    Aggregator;
  *  - agg: the typed bounded [[graft.functions.TopKAggregator]], the
  *    explicit O(k)-state formulation, as the reference line.
  *
  * Measured (sf0.1 documents replicated into a single stratum,
  * local[32]): both flat 1× → 500× (5 M → 25 M rows in ONE group),
  * window 0.8–2.3 s, Aggregator 0.9–2.8 s — the optimizer already
  * implements the bounded-heap shape, without the typed-encoding cost
  * (at the 100× text stage the window form ran q_sample_weighted in
  * 1.7 s vs 3.3 s for an Aggregator rewrite). This probe is why
  * `q_sample_weighted`/`q_ngram_top` KEEP the window formulation and
  * pin `WindowGroupLimit ... Partial` in `AggregatorSpec` instead of
  * hand-scheduling it — while `q_dedup_keep_best`, whose old plan also
  * needed `count(*) OVER (PARTITION BY cluster)` (a full-group window
  * no limit pushdown can bound), moved to groupBy + max_by.
  *
  * The ranking key is the md5-derived E-S draw `q_sample_weighted`
  * uses, so the probe times the exact arithmetic of the shipped
  * operator, not a toy column.
  *
  * Usage: runMain graft.tools.TopKProbe [sfDir] [k-replications...]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10, 50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def scaled(k: Int): DataFrame = {
      val base = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars"))
      val n = base.count()
      (0 until k).map(i => base.withColumn("doc_id", col("doc_id") + lit(i * n)))
        .reduce(_ union _).repartition(cpus.toInt)
    }

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[topk-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    val draw = graft.ops.Text.sampleDraw("CAST(CAST(doc_id AS STRING) AS BINARY)")
    reps.foreach { k =>
      // one hot stratum: every row lands in group "all"
      val scored = scaled(k)
        .withColumn("g", lit("all"))
        .withColumn("es_key",
          round(expr(s"ln((($draw) + 1) / 1002.0) / n_chars"), 6))
        .cache()
      scored.count() // materialize outside the timed region

      time(s"window row_number   ${k}x") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("es_key").desc, col("doc_id").asc)
        scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5).count()
      }
      time(s"TopKAggregator      ${k}x") {
        val topk = new graft.functions.TopKAggregator(5)
        scored.select(col("g"), col("doc_id"), col("es_key"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .mapValues { case (_, i, s) => (i, s) }
          .agg(topk.toColumn.name("topk"))
          .flatMap { case (g, items) => items.map { case (i, s) => (g, i, s) } }
          .count()
      }
      scored.unpersist()
    }
    spark.stop()
  }
}
