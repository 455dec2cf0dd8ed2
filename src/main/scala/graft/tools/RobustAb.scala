package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Same-session alternating A/B of the r19 Robust restructure (one
  * value-count aggregation feeding thresholds AND the weighted final
  * pass, vs the old three-scan shape): the old formulations are
  * inlined VERBATIM below so both run in one JVM, interleaved, with a
  * result-equality assertion per round — the only adjudication that
  * survives ambient drift (r18's evidence pattern).
  * Usage: runMain graft.tools.RobustAb <sfDir> [rounds]
  */
object RobustAb {

  // ---- OLD shapes, verbatim from the pre-r19 Robust.scala ----------

  private def oldOrderStats(prices: DataFrame,
    ks: Seq[(Int, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = prices.withColumn("bkt", expr("CAST(p * 100 AS BIGINT) div 8192"))
    val hist = b.groupBy("g", "bkt").agg(count(lit(1)).as("c"))
    val wPrior = Window.partitionBy("g").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withStart = hist
      .withColumn("start", coalesce(sum(col("c")).over(wPrior), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("g")))
    val wanted = withStart.select(col("g"), col("bkt"), col("start"),
        col("c"), explode(array(ks.map { case (d, kExpr) =>
          struct(lit(d).as("d"), expr(kExpr).as("k")) }: _*)).as("dk"))
      .filter(col("dk.k") > col("start") &&
        col("dk.k") <= col("start") + col("c"))
      .select(col("g"), col("bkt"), col("dk.d").as("d"),
        (col("dk.k") - col("start")).as("kr"))
    val wv = Window.partitionBy("g", "d").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(wanted), Seq("g", "bkt"))
      .groupBy("g", "d", "kr", "p").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wv))
      .filter(col("cum") >= col("kr"))
      .groupBy("g", "d").agg(min(col("p")).as("t"))
  }

  private def oldWinsorize(df: DataFrame, group: Column, value: Column,
    pLo: Int, pHi: Int): DataFrame = {
    val prices = df.select(group.as("g"),
      value.cast(DecimalType(12, 2)).as("p"))
    val stats = oldOrderStats(prices, Seq(
      0 -> s"(n * $pLo + 99) div 100", 1 -> s"(n * $pHi + 99) div 100"))
    val thresholds = stats.groupBy("g").agg(
      min(when(col("d") === 0, col("t"))).as("lo"),
      min(when(col("d") === 1, col("t"))).as("hi"))
    prices.join(broadcast(thresholds), "g")
      .select(col("g"),
        least(greatest(col("p"), col("lo")), col("hi")).as("cl"),
        (col("p") < col("lo")).cast("long").as("is_lo"),
        (col("p") > col("hi")).cast("long").as("is_hi"))
      .groupBy(col("g").as("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cl")).cast("double").as("win_sum"),
        sum(col("is_lo")).as("n_clamped_lo"),
        sum(col("is_hi")).as("n_clamped_hi"))
      .orderBy("l_returnflag")
  }

  private def oldFeatureBins(df: DataFrame, group: Column,
    value: Column): DataFrame = {
    val prices = df.select(group.as("g"),
      value.cast(DecimalType(12, 2)).as("p"))
    val stats = oldOrderStats(prices,
      (1 to 9).map(d => d -> s"(n * $d + 9) div 10"))
    val tCols = (1 to 9).map(d =>
      min(when(col("d") === d, col("t"))).as(s"t$d"))
    val thresholds = stats.groupBy("g").agg(tCols.head, tCols.tail: _*)
    val bin = (1 to 9).map(d => (col("p") > col(s"t$d")).cast("int"))
      .reduce(_ + _)
    prices.join(broadcast(thresholds), "g")
      .withColumn("bin", bin)
      .groupBy(col("g").as("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("p")).cast("double").as("lo"),
        max(col("p")).cast("double").as("hi"))
      .orderBy("l_returnflag", "bin")
  }

  private def oldZscore(df: DataFrame, group: Column,
    value: Column): DataFrame = {
    val w = df.select(group.as("g"),
      (value.cast(DecimalType(12, 2)) * 100).cast("long").as("w"))
    val d38 = DecimalType(38, 0)
    val stats = w.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("w").cast(d38)).as("s"),
      sum(col("w").cast(d38) * col("w")).as("q"),
      max(abs(col("w"))).as("m"))
    val lhs = col("w").cast(d38) * col("n") - col("s")
    val rhs = (col("q").cast(d38) * col("n") - col("s").cast(d38) * col("s")) * 4
    val headroom = lit("1000000000000000000").cast(d38)
    val guarded = isnull(assert_true(
      col("m").cast(d38) * col("n") <= headroom,
      lit("zscoreOutliers: max|w|*n exceeds DECIMAL(38) headroom; " +
        "center values per group before squaring")))
    w.join(broadcast(stats), "g")
      .select(col("g"), col("n"), col("s"),
        (guarded && (lhs * lhs > rhs)).cast("int").as("is_out"))
      .groupBy(col("g").as("event_type"))
      .agg(first(col("n")).as("n_events"),
        sum(col("is_out")).as("n_outliers"),
        first(col("s")).as("s"))
      .select(col("event_type"), col("n_events"), col("n_outliers"),
        (expr("CASE WHEN s < 0 THEN -1L ELSE 1L END") *
          expr("(abs(s) * 10000 * 2 + n_events) div (n_events * 2)"))
          .cast("double").divide(lit(1000000.0)).as("avg_value"))
      .orderBy("event_type")
  }

  // -------------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = () => graft.Tables.lineitem(spark, sfDir)
    val ev = () => graft.Tables.events(spark, sfDir)

    case class Lane(name: String, old: () => DataFrame, neu: () => DataFrame)
    val lanes = Seq(
      Lane("winsorize",
        () => oldWinsorize(li(), col("l_returnflag"), col("l_extendedprice"), 1, 99),
        () => graft.ops.Robust.winsorize(li(), col("l_returnflag"),
          col("l_extendedprice"), 1, 99)),
      Lane("feature_binning",
        () => oldFeatureBins(li(), col("l_returnflag"), col("l_extendedprice")),
        () => graft.ops.Robust.featureBins(li(), col("l_returnflag"),
          col("l_extendedprice"))),
      Lane("event_zscore",
        () => oldZscore(ev(), col("event_type"), col("value")),
        () => graft.ops.Robust.zscoreOutliers(ev(), col("event_type"),
          col("value"))))

    // warm both shapes (codegen/JIT)
    lanes.foreach { l => l.old().count(); l.neu().count() }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    lanes.foreach { l =>
      val eq = l.old().collect().toSeq == l.neu().collect().toSeq
      println(s"[robust-ab] ${l.name} results ${if (eq) "==" else "DIFFER!"}")
      (1 to rounds).foreach { r =>
        val o = time(l.old); val n = time(l.neu)
        println(f"[robust-ab] ${l.name} round$r old ${o}%.2fs new ${n}%.2fs")
      }
    }
    spark.stop()
  }
}
